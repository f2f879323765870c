package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-mix selection operators: DSIR importance resampling (q106) and
  * UniMax epoch-capped budget allocation (q107). The oracle queries pin
  * exact values against DuckDB; this spec pins the semantic invariants
  * (selection really is the top-k by weight; the UniMax greedy's prefix /
  * budget / cap laws) and the plan shapes that matter at scale (bucket
  * model broadcast, two-phase top-k, per-source frame only).
  */
class DsirUnimaxSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q106: selected = top-k by (log_w desc, doc_id); weights favor target-like text") {
    val rows = graft.CacheScope.run {
      CorpusOps.q106DsirSelect(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    }
    assert(rows.nonEmpty)
    val k = math.min(CorpusOps.DSIR_TOP_K, rows.length)
    assert(rows.count(_._4) == k, s"expected exactly $k selected")
    // selection law: every selected row beats every unselected row under
    // the deterministic (log_w desc, doc_id asc) order
    val worstSel = rows.filter(_._4).map(r => (-r._3, r._1)).max
    val bestUnsel = rows.filterNot(_._4).map(r => (-r._3, r._1))
    if (bestUnsel.nonEmpty)
      assert(implicitly[Ordering[(Double, Long)]].lt(worstSel, bestUnsel.min),
        "an unselected doc outranks a selected one")
    // a doc's feature count is its bigram count (tokens - 1)
    val docs = graft.Tables.load(spark, sf, "documents")
      .filter(col("source") =!= "src0")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.take(20).foreach { case (id, nf, _, _) =>
      assert(nf == docs(id).toLong, s"doc $id n_feats $nf != bigrams ${docs(id)}")
    }
    // docs made of target-distribution text outscore off-distribution
    // ones: score a raw doc whose bigrams ALL appear in src0 vs one whose
    // bigrams never do — the LLR model must order them
    val byId = rows.map(r => r._1 -> r._3).toMap
    val d = graft.Tables.load(spark, sf, "documents")
    val srcGrams = d.filter(col("source") === "src0")
      .select(explode(expr(
        """transform(sequence(1, size(split(text, ' ')) - 1),
          |  i -> concat(split(text, ' ')[i - 1], ' ', split(text, ' ')[i]))"""
          .stripMargin)).as("bg"))
      .distinct().collect().map(_.getString(0)).toSet
    val rawDocs = d.filter(col("source") =!= "src0")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").sliding(2)
        .filter(_.length == 2).map(_.mkString(" ")).toSeq))
      .filter(_._2.nonEmpty)
    val allIn = rawDocs.filter { case (_, bgs) => bgs.forall(srcGrams.contains) }
    val noneIn = rawDocs.filter { case (_, bgs) => !bgs.exists(srcGrams.contains) }
    if (allIn.nonEmpty && noneIn.nonEmpty) {
      val meanIn = allIn.map(x => byId(x._1) / x._2.length).sum / allIn.length
      val meanOut = noneIn.map(x => byId(x._1) / x._2.length).sum / noneIn.length
      assert(meanIn > meanOut,
        s"per-feature weight of target-covered docs ($meanIn) must exceed uncovered ($meanOut)")
    }
  }

  test("log_w_micro is summation-order independent and rounding-safe") {
    // the weight is an integer micro-unit sum, so ANY partitioning (and
    // therefore any summation order) must produce bitwise-equal weights —
    // the property that makes the frozen q113 threshold exact. A double
    // sum would fail this only near ulp boundaries; the integer sum
    // cannot fail it at all, and this pins the contract.
    val d = graft.Tables.load(spark, sf, "documents")
    val feats = CorpusOps.dsirFeats(d, Seq("source"))
    val rawF = feats.filter(col("source") =!= "src0")
    val model = CorpusOps.dsirModelOf(
      CorpusOps.dsirFeats(d.filter(col("source") === "src0")), rawF)
    def weights(parts: Int) =
      CorpusOps.dsirWeightsOf(rawF.repartition(parts), model)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(weights(1) == weights(13),
      "per-doc micro weights depend on partitioning")
    // per-feature rounding margin: the one remaining cross-engine
    // exposure is a bucket lr whose micro value sits at an exact .5
    // boundary while the two engines' ln() differ by an ulp. Measure the
    // margin: min distance of lr*1e6 from the nearest half-integer must
    // dwarf the ~1e-9 an ulp of ln can move it.
    val margins = model.collect().map { r =>
      val x = r.getDouble(1) * 1e6
      math.abs(x - math.floor(x) - 0.5)
    }
    assert(margins.min > 1e-4,
      s"a model bucket's lr*1e6 sits ${margins.min} from a rounding boundary")
  }

  test("q106 plan: bucket model broadcasts; top-k is the two-phase take") {
    val p = CorpusOps.q106DsirSelect(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "bucket model must broadcast:\n" + p)
    // the global top-k must ride the two-phase shape: phase 1's window
    // key carries the partition id (aliased _tp_pid in the executed
    // plan), so no single reducer ever sorts the full weight table
    assert(p.contains("windowspecdefinition(_tp_pid"),
      "top-k collapsed to a single global window:\n" + p)
    assert("\\bWindow \\[".r.findAllIn(p).size >= 2,
      "expected both quota phases as Window operators:\n" + p)
  }

  test("q113 serves the q106 answer from the stored model; serve plan never re-aggregates") {
    val tmp = java.nio.file.Files.createTempDirectory("dsiridx").toString
    CorpusOps.writeDsirIndex(spark, sf, s"$tmp/idx")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val raw = graft.Tables.load(spark, sf, "documents")
      .filter(col("source") =!= "src0").select(col("doc_id"), col("text"))
    val served = graft.CacheScope.run {
      collect(CorpusOps.dsirAgainstLoaded(raw, CorpusOps.loadDsirIndex(spark, s"$tmp/idx")))
    }
    val inline = graft.CacheScope.run { collect(CorpusOps.q106DsirSelect(spark, sf)) }
    assert(served == inline, "stored-model serving drifted from the inline query")
    // zero retrain: the serve plan holds no window (the top-k became a
    // frozen threshold literal) and no aggregate beyond the per-doc sum
    val p = CorpusOps.dsirAgainstLoaded(raw,
      CorpusOps.loadDsirIndex(spark, s"$tmp/idx"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "serve plan recomputes the top-k ranking:\n" + p)
    // a post-build doc hitting only unseen buckets still scores (the
    // both-unseen default ratio), never drops
    import spark.implicits._
    val novel = Seq((999999L, "zzqx1 zzqx2 zzqx3")).toDF("doc_id", "text")
    val scoredNovel = CorpusOps.dsirAgainstLoaded(novel,
      CorpusOps.loadDsirIndex(spark, s"$tmp/idx")).collect()
    assert(scoredNovel.length == 1 && scoredNovel(0).getLong(1) == 2L,
      "unseen-bucket features must score via the default ratio, not vanish")
  }

  test("q107: capped prefix, budget conservation, epoch cap, uniform remainder") {
    val rows = CorpusOps.q107UnimaxMix(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val e = CorpusOps.UNIMAX_EPOCHS.toDouble
    val total = rows.map(_._2).sum
    val budget = (total / 2).toDouble
    // the capped set is a PREFIX of the ascending-size order
    val asc = rows.sortBy(r => (r._2, r._1))
    val firstUncapped = asc.indexWhere(!_._3)
    if (firstUncapped >= 0)
      assert(asc.drop(firstUncapped).forall(!_._3),
        "capped sources must form an ascending-size prefix")
    // nobody exceeds the epoch cap (rounding slack)
    rows.foreach { case (s, n, capped, alloc, ep) =>
      assert(ep <= e + 1e-6, s"source $s exceeds the epoch cap: $ep")
      if (capped) {
        assert(math.abs(alloc - e * n) < 1e-6, s"capped source $s alloc $alloc != ${e * n}")
        assert(math.abs(ep - e) < 1e-6, s"capped source $s epochs $ep != $e")
      }
    }
    // uncapped sources share the leftover EQUALLY and the budget is spent
    val uncapped = rows.filterNot(_._3).map(_._4)
    if (uncapped.nonEmpty)
      assert(uncapped.distinct.length == 1, s"uneven uniform shares: $uncapped")
    val spent = rows.map(_._4).sum
    assert(math.abs(spent - budget) < rows.length.toDouble,
      s"allocations $spent stray from the budget $budget")
  }

  test("q107 on a constructed skew: tiny sources capped, giants split the rest") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("unimax").toString
    // 4 sources: two tiny (5 and 10 tokens), two giants (1000 each).
    // total = 2015, budget = 1007. Greedy: s_tiny capped (2*5=10 and
    // 2*10=20 both under their uniform shares), giants split
    // (1007 - 30) / 2 = 488.5 each.
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    Seq((1L, txt(5), "en", "sA", 1L), (2L, txt(10), "en", "sB", 1L),
      (3L, txt(1000), "en", "sC", 1L), (4L, txt(1000), "en", "sD", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.q107UnimaxMix(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("sA") == ((true, 10.0, 2.0)))
    assert(out("sB") == ((true, 20.0, 2.0)))
    assert(out("sC") == ((false, 488.5, 0.4885)))
    assert(out("sD") == ((false, 488.5, 0.4885)))
  }
}
