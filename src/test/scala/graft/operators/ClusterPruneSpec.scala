package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q114 (Minipile-style cluster-level pruning): the oracle pins exact
  * values; this spec pins the pruning law (exactly PRUNE_CLUSTERS
  * clusters dropped, and they are the worst ones), the shared-kernel
  * contracts (assignment = q72, score = q88), and the scale shape (the
  * verdict table broadcasts; no corpus-wide ranking window).
  */
class ClusterPruneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("prunes exactly the PRUNE_CLUSTERS lowest-mean-quality clusters") {
    val rows = graft.CacheScope.run {
      Similarity.q114ClusterPrune(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4), r.getBoolean(5)))
    }
    assert(rows.nonEmpty)
    // cluster-level view is consistent: one (mean_q, n_docs, pruned) per cluster
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (c, v) =>
      assert(v.map(r => (r._4, r._5, r._6)).distinct.size == 1,
        s"cluster $c carries inconsistent verdict rows")
      assert(v.head._5 == v.size.toLong, s"cluster $c n_docs mismatch")
    }
    val verdicts = byCluster.map { case (c, v) => (c, v.head._4, v.head._6) }.toSeq
    val pruned = verdicts.filter(_._3)
    assert(pruned.size == Similarity.PRUNE_CLUSTERS,
      s"expected ${Similarity.PRUNE_CLUSTERS} pruned clusters, got ${pruned.size}")
    // the pruned set is the BOTTOM of the (mean_q, cluster) order
    val worstKept = verdicts.filterNot(_._3).map(v => (v._2, v._1)).min
    pruned.foreach { case (c, q, _) =>
      assert(implicitly[Ordering[(Double, Long)]].lt((q, c), worstKept),
        s"pruned cluster $c ($q) outranks a kept cluster $worstKept")
    }
    // per-doc score is q88's score and cluster is q72's assignment
    val q88 = TextAnalysis.qualityScored(
      graft.Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q72 = Similarity.q72KmeansAssign(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, c, s, _, _, _) =>
      assert(s == q88(id), s"doc $id score drifted from the q88 kernel")
      assert(c == q72(id), s"doc $id cluster drifted from the q72 kernel")
    }
  }

  test("constructed corpus: the gibberish-free cluster survives, the spam pocket dies") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("prune").toString
    // embeddings: 3 tight pockets around seeds 0/1/2 (k=8 seeds are ids
    // 0..7; ids >= 8 land nearest one of the three pocket anchors)
    def v(base: Double) = Array.fill(4)(base.toFloat)
    val emb = (0L to 7L).map(i => (i, v(i * 10.0), 0)) ++
      (8L to 17L).map(i => (i, v(0.1), 0)) ++   // pocket A -> seed 0
      (18L to 27L).map(i => (i, v(10.2), 0)) ++ // pocket B -> seed 1
      (28L to 37L).map(i => (i, v(20.3), 0))    // pocket C -> seed 2
    emb.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    // documents: pocket A repeats one token (score ~ 1/6), pockets B/C
    // are all-distinct (score 1.0); seeds get middling text
    def doc(i: Long, text: String) = (i, text, "en", "src1", text.length.toLong)
    val docs = (0L to 7L).map(i => doc(i, s"w$i x$i y$i y$i")) ++
      (8L to 17L).map(i => doc(i, "spam spam spam spam spam u" + i)) ++
      (18L to 27L).map(i => doc(i, s"alpha$i beta$i gamma$i delta$i")) ++
      (28L to 37L).map(i => doc(i, s"one$i two$i three$i four$i"))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Similarity.q114ClusterPrune(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(5)))).toMap
    // the spam pocket (cluster 0) is pruned; B and C survive
    (8L to 17L).foreach { i =>
      assert(out(i)._1 == 0L && out(i)._2, s"spam doc $i not pruned: ${out(i)}")
    }
    (18L to 27L).foreach { i =>
      assert(out(i)._1 == 1L && !out(i)._2, s"pocket-B doc $i wrongly pruned")
    }
    (28L to 37L).foreach { i =>
      assert(out(i)._1 == 2L && !out(i)._2, s"pocket-C doc $i wrongly pruned")
    }
  }

  test("q118 serves the q114 answer from the stored index; serve plan never re-ranks") {
    val tmp = java.nio.file.Files.createTempDirectory("pruneidx").toString
    Similarity.writeClusterPruneIndex(spark, dir, s"$tmp/idx")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getBoolean(5)))).toMap
    val docsWithEmb = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .join(spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    val served = graft.CacheScope.run {
      key(Similarity.clusterPruneAgainstLoaded(docsWithEmb,
        Similarity.loadClusterPruneIndex(spark, s"$tmp/idx")))
    }
    val inline = graft.CacheScope.run { key(Similarity.q114ClusterPrune(spark, dir)) }
    assert(served == inline, "stored-index serving drifted from the inline query")
    // zero re-clustering at serve time: no window (the ranking became a
    // frozen verdict table) and no aggregate anywhere in the plan
    val p = Similarity.clusterPruneAgainstLoaded(docsWithEmb,
      Similarity.loadClusterPruneIndex(spark, s"$tmp/idx"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "serve plan re-ranks clusters:\n" + p)
    assert(!p.contains("HashAggregate"), "serve plan re-aggregates quality:\n" + p)
    // refusal contract: no meta — no serving
    intercept[IllegalStateException] {
      Similarity.loadClusterPruneIndex(spark, s"$tmp/nothere")
    }
  }

  test("plan: verdicts broadcast back; no corpus-wide ranking window") {
    val df = Similarity.q114ClusterPrune(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "cluster verdicts must broadcast:\n" + p)
    // the only window ranks the k-row cluster frame: its partition spec is
    // empty BUT its input is the k-bounded aggregate, never `documents` —
    // assert no window sits above a parquet scan of the corpus by checking
    // the window's subtree has an aggregate below it
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size == 1, s"expected exactly one (k-row) window:\n$p")
    val hasAggBelow = windows.head.child.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.nonEmpty
    assert(hasAggBelow, "the ranking window must sit on the k-row cluster aggregate")
  }
}
