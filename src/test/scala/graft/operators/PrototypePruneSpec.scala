package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q124 (Sorscher-style prototypicality pruning): the oracle pins exact
  * values; this spec pins the pruning law (pruned ⟺ strictly below the
  * cluster's mean distance, decided in integer space), the prototype
  * contract (micro-unit Lloyd mean of the q72 assignment), the rounding
  * margins the cross-engine hash match leans on, and the scale shape
  * (k-bounded verdicts broadcast; no corpus window).
  */
class PrototypePruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6

  test("prune law, prototype contract and q72 assignment parity") {
    val rows = graft.CacheScope.run {
      Similarity.q124PrototypePrune(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4), r.getBoolean(5)))
    }
    assert(rows.nonEmpty)
    // cluster view consistent + n_vecs correct
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, v) =>
      assert(v.map(r => (r._4, r._5)).distinct.size == 1,
        s"cluster $c carries inconsistent verdict rows")
      assert(v.head._5 == v.size.toLong, s"cluster $c n_vecs mismatch")
    }
    // assignment is q72's
    val q72 = Similarity.q72KmeansAssign(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, c, _, _, _, _) =>
      assert(c == q72(id), s"vec $id cluster drifted from the q72 kernel")
    }
    // recompute prototypes + distances from raw embeddings (micro-unit
    // discipline) and pin dist2m, mean_d2 and the integer-space verdict
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val protos = byCluster.map { case (c, v) =>
      val members = v.map(r => emb(r._1))
      val dim = members.head.length
      c -> Array.tabulate(dim) { i =>
        val s = members.map(m => math.round(m(i).toDouble * 1e6)).sum
        round6(s.toDouble / members.length / 1e6)
      }
    }
    byCluster.foreach { case (c, v) =>
      val p = protos(c)
      val dms = v.map { case (id, _, d2m, _, _, _) =>
        val e = emb(id)
        val d = round6(p.indices.map(i => {
          val df = e(i).toDouble - p(i); df * df
        }).sum)
        assert(d == d2m, s"vec $id dist2m $d2m != recomputed $d")
        math.round(d * 1e6)
      }
      val sum = dms.sum
      val n = dms.size
      v.zip(dms).foreach { case ((id, _, _, meanD2, _, pruned), dm) =>
        assert(pruned == (dm * n < sum),
          s"vec $id verdict drifted from the integer prune law")
        assert(meanD2 == round6(sum.toDouble / n / 1e6),
          s"cluster $c mean_d2 drifted")
      }
    }
    // both verdicts occur somewhere (the law is non-degenerate on the fixture)
    assert(rows.exists(_._6) && rows.exists(!_._6))
  }

  test("rounding margins: the two micro-unit inputs sit off half-integers") {
    // dist2m's pre-rounding sum re-associates across engines (DuckDB may
    // sum the 64 terms in another order): bound the wobble by n·ulp(d)
    // and require the half-integer margin at the 1e6 scale to dwarf it.
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val assigned = graft.CacheScope.run {
      Similarity.q124PrototypePrune(spark, dir)
        .select(col("vec_id"), col("cluster")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val protos = assigned.groupBy(_._2).map { case (c, v) =>
      val members = v.map(r => emb(r._1))
      c -> Array.tabulate(members.head.length) { i =>
        val s = members.map(m => math.round(m(i).toDouble * 1e6)).sum
        round6(s.toDouble / members.length / 1e6)
      }
    }
    assigned.foreach { case (id, c) =>
      val p = protos(c)
      val e = emb(id)
      val d = p.indices.map(i => { val df = e(i).toDouble - p(i); df * df }).sum
      val x = d * 1e6
      val margin = math.abs(x - math.floor(x) - 0.5)
      val drift = p.length * math.ulp(x)
      assert(margin > math.max(1e-5, 10 * drift),
        s"vec $id: dist2m*1e6 = $x sits $margin from a half-integer " +
          s"(re-association drift bound $drift)")
    }
    // embedding micro-units: v*1e6 is ONE shared IEEE multiply of the
    // identical widened float on both engines — bitwise equal inputs —
    // but assert the margin anyway so a future fixture regen that lands
    // a value ON a boundary (where round-half semantics must then agree)
    // is at least visible.
    val vMargin = emb.values.flatten.map { f =>
      val x = math.abs(f.toDouble) * 1e6
      math.abs(x - math.floor(x) - 0.5)
    }.min
    assert(vMargin > 1e-7, s"embedding*1e6 margin $vMargin")
  }

  test("constructed pockets: the dense core is pruned, satellites survive") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("proto").toString
    // k = PRUNE_K seeds are ids 0..7 spread far apart; ids >= 8 form one
    // pocket near seed 0: a tight core at 0.1 plus two far satellites.
    def v(base: Double) = Array.fill(4)(base.toFloat)
    val emb = (0L to 7L).map(i => (i, v(i * 100.0), 0)) ++
      (8L to 15L).map(i => (i, v(0.1), 0)) ++ // core: hugs the prototype
      Seq((16L, v(30.0), 0), (17L, v(-30.0), 0)) // satellites
    emb.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    spark.range(1).selectExpr("id AS doc_id", "'x' AS text", "'en' AS lang",
      "'src0' AS source", "1L AS n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = graft.CacheScope.run {
      Similarity.q124PrototypePrune(spark, tmp)
        .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    }
    // pocket members assigned to seed-0's cluster: core (incl. seed 0)
    // sits under the mean distance -> pruned; satellites above -> kept
    (8L to 15L).foreach(id => assert(out(id), s"core vec $id should prune"))
    assert(!out(16L) && !out(17L), "satellites must survive")
    // lone far seeds are their cluster's only member: dist == mean, kept
    (1L to 7L).foreach(id => assert(!out(id), s"singleton $id must survive"))
  }

  test("plan: verdicts broadcast back; no corpus-wide window") {
    val df = Similarity.q124PrototypePrune(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "k-row verdict table must broadcast:\n" + p)
    assert(!p.contains("Window"), "no window anywhere in the prune plan:\n" + p)
  }
}
