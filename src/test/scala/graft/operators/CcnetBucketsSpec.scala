package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q108 CCNet-style target-LM perplexity bucketing: the oracle pins exact
  * values; this spec pins the tercile law, the model's direction (target-
  * like text scores better than off-distribution text), and the scale
  * shape (target model broadcasts — the corpus side never sort-merges).
  */
class CcnetBucketsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("terciles partition by avg_nll; buckets are ordered and balanced") {
    val rows = graft.CacheScope.run {
      CorpusOps.q108CcnetBuckets(spark, sf)
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    }
    assert(rows.nonEmpty)
    val byB = rows.groupBy(_._3).map { case (k, v) => k -> v.map(_._2) }
    assert(byB.keySet == Set("head", "middle", "tail"), s"buckets: ${byB.keySet}")
    // ordering law: max(head) <= min(middle) boundary-consistent etc.
    assert(byB("head").max <= byB("middle").min + 1e-12,
      "a head doc scores worse than a middle doc")
    assert(byB("middle").max <= byB("tail").min + 1e-12,
      "a middle doc scores worse than a tail doc")
    // terciles: each bucket within ±2 of n/3 plus boundary ties
    val n = rows.length
    byB.foreach { case (b, v) =>
      assert(math.abs(v.length - n / 3.0) <= n / 6.0,
        s"bucket $b holds ${v.length} of $n — not a tercile split")
    }
  }

  test("constructed corpus: verbatim target text lands in head, gibberish in tail") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ccnet").toString
    val target = "the cat sat on the mat and the dog sat on the rug"
    val docs =
      // the target slice the LM trains on
      (1L to 5L).map(i => (i, target, "en", "src0", target.length.toLong)) ++
        // raw docs at three score levels: 4 verbatim target copies,
        // 4 half-seen strings, 4 all-unseen strings — three distinct nll
        // values so the tercile boundaries interpolate BETWEEN groups
        (10L to 13L).map(i => (i, target, "en", "srcX", target.length.toLong)) ++
        (15L to 18L).map(i =>
          (i, s"the cat sat on zz$i qq$i vv$i", "en", "srcX", 20L)) ++
        (20L to 23L).map(i =>
          (i, s"zz$i qq$i vv$i kk$i jj$i xx$i", "en", "srcX", 20L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.q108CcnetBuckets(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getString(3)))).toMap
    (10L to 13L).foreach { i =>
      assert(out(i)._2 == "head", s"verbatim-target doc $i bucketed ${out(i)}")
    }
    (15L to 18L).foreach { i =>
      assert(out(i)._2 == "middle", s"half-seen doc $i bucketed ${out(i)}")
      assert(out(i)._1 > out(10L)._1, "half-seen must score above verbatim target")
    }
    (20L to 23L).foreach { i =>
      assert(out(i)._2 == "tail", s"gibberish doc $i bucketed ${out(i)}")
      assert(out(i)._1 > out(15L)._1, "gibberish must score above half-seen")
    }
  }

  test("avg_nll is summation-order independent (micro-unit integer sum)") {
    // partitioning changes the order doubles would be summed in; the
    // micro-unit integer sum makes the score — and therefore which side
    // of a frozen tercile boundary a doc lands on — partition-invariant.
    val toks = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
    val tgt = toks.filter(col("source") === "src0")
    val tgtUni = tgt.select(explode(col("toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = tgtUni.agg(count(lit(1)).as("v"))
    val tgtBig = CorpusOps.ccnetBigrams(tgt).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val raw = CorpusOps.ccnetBigrams(toks.filter(col("source") =!= "src0"))
    def scores(parts: Int) =
      CorpusOps.ccnetScores(raw.repartition(parts), tgtUni, tgtBig, vocab)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1) == scores(13), "avg_nll depends on partitioning")
  }

  test("q109 serves the q108 answer from the stored LM; serve plan never re-aggregates") {
    val tmp = java.nio.file.Files.createTempDirectory("ccnetidx").toString
    CorpusOps.writeCcnetIndex(spark, sf, s"$tmp/idx")
    val served = graft.CacheScope.run {
      CorpusOps.ccnetAgainstLoaded(
        graft.Tables.load(spark, sf, "documents")
          .filter(col("source") =!= "src0").select(col("doc_id"), col("text")),
        CorpusOps.loadCcnetIndex(spark, s"$tmp/idx"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3))))
        .toMap
    }
    val inline = graft.CacheScope.run {
      CorpusOps.q108CcnetBuckets(spark, sf)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getString(3))))
        .toMap
    }
    assert(served == inline, "stored-LM serving drifted from the inline query")
    // zero retrain at serve time: no percentile aggregate, no target-slice
    // scan — the boundaries are plan literals from the meta
    val p = CorpusOps.ccnetAgainstLoaded(
      graft.Tables.load(spark, sf, "documents")
        .filter(col("source") =!= "src0").select(col("doc_id"), col("text")),
      CorpusOps.loadCcnetIndex(spark, s"$tmp/idx"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("percentile"), "serve plan recomputes boundaries:\n" + p)
    // refusal contract: no meta — no serving
    intercept[IllegalStateException] {
      CorpusOps.loadCcnetIndex(spark, s"$tmp/nothere")
    }
  }

  test("plan: the target LM broadcasts — no sort-merge join anywhere") {
    val p = CorpusOps.q108CcnetBuckets(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "target bigram/unigram tables must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "corpus-side scoring must never shuffle for a join:\n" + p)
  }
}
