package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q116 (DoReMi-flavored domain reweighting): the oracle pins exact
  * values; this spec pins the softmax laws (weights simplex-valued and
  * anti-monotone in excess), the direction (a target-aligned domain
  * out-weighs an off-distribution one), and the broadcast plan shape.
  */
class DomainWeightsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("weights form a simplex and are anti-monotone in excess") {
    val rows = graft.CacheScope.run {
      CorpusOps.q116DomainWeights(spark, sf)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    }
    assert(rows.nonEmpty)
    assert(!rows.exists(_._1 == "src0"), "the target slice must not be weighted")
    rows.foreach { case (s, n, t, sl, e, w) =>
      assert(n > 0 && w > 0 && w < 1, s"source $s weight $w out of (0,1)")
      assert(math.abs(e - BigDecimal(t - sl).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"source $s excess $e != tgt - self")
    }
    val total = rows.map(_._6).sum
    assert(math.abs(total - 1.0) < 1e-4 * rows.length,
      s"weights sum to $total, not ~1")
    // softmax is strictly decreasing in excess
    rows.sortBy(_._5).sliding(2).foreach {
      case Array((sa, _, _, _, ea, wa), (sb, _, _, _, eb, wb)) =>
        if (ea < eb) assert(wa > wb,
          s"$sa (excess $ea, w $wa) must out-weigh $sb (excess $eb, w $wb)")
      case _ =>
    }
  }

  test("constructed corpus: the target-aligned source out-weighs the gibberish source") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("doremi").toString
    val target = "the cat sat on the mat and the dog sat on the rug"
    val docs =
      (1L to 6L).map(i => (i, target, "en", "src0", target.length.toLong)) ++
        // srcA: verbatim target text — zero excess surprise under the target LM
        (10L to 15L).map(i => (i, target, "en", "srcA", target.length.toLong)) ++
        // srcB: internally repetitive gibberish — easy for the self LM,
        // maximally surprising for the target LM -> high excess
        (20L to 25L).map(i =>
          (i, "zork blat zork blat zork blat zork blat", "en", "srcB", 40L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.CacheScope.run {
      CorpusOps.q116DomainWeights(spark, tmp)
        .collect().map(r => r.getString(0) -> ((r.getDouble(4), r.getDouble(5)))).toMap
    }
    assert(out.keySet == Set("srcA", "srcB"), s"sources: ${out.keySet}")
    assert(out("srcA")._1 < out("srcB")._1,
      s"target-verbatim srcA must have lower excess: $out")
    assert(out("srcA")._2 > out("srcB")._2,
      s"target-verbatim srcA must be up-weighted: $out")
  }

  test("softmax exp terms sit away from their rounding boundary") {
    // The one new micro-unit rounding whose INPUT each engine computes
    // with its own libm: `_em = round(exp(-excess) * 1e9)`. `excess`
    // itself is pinned (micro-unit integer sums, round-6), so the only
    // cross-engine exposure is exp(-excess)*1e9 sitting at an exact .5
    // boundary while the two engines' exp() differ by an ulp. Mirror of
    // the DsirUnimaxSpec ln-margin: min distance from a half-integer
    // must dwarf the ~|x|*1e-16 an exp ulp can move it (~1e-7 at the
    // 1e9 scale of these terms).
    val rows = graft.CacheScope.run {
      CorpusOps.q116DomainWeights(spark, sf)
        .select(col("source"), col("excess")).collect()
        .map(r => r.getString(0) -> r.getDouble(1))
    }
    assert(rows.nonEmpty)
    rows.foreach { case (s, e) =>
      val x = math.exp(-e) * 1e9
      val margin = math.abs(x - math.floor(x) - 0.5)
      val ulpDrift = math.abs(x) * 1e-15
      assert(margin > math.max(1e-4, 10 * ulpDrift),
        s"source $s: exp(-$e)*1e9 = $x sits $margin from a half-integer " +
          s"(ulp drift bound $ulpDrift)")
    }
  }

  test("plan: target LM broadcasts; the output frame is #sources rows") {
    val df = CorpusOps.q116DomainWeights(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "target model tables must broadcast:\n" + p)
    assert(!p.contains("Window"), "no window anywhere in the weight plan:\n" + p)
  }
}
