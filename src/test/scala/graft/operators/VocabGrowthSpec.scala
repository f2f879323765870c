package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q128 (Heaps-law vocabulary growth): the oracle pins exact values; this
  * spec pins the curve laws (monotone, gap-free, totals reconcile with
  * the global vocabulary) and the order contract with q89's export.
  */
class VocabGrowthSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curve laws: monotone cumulative counts that reconcile exactly") {
    val rows = graft.CacheScope.run {
      TextAnalysis.q128VocabGrowth(spark, dir)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1)
    }
    assert(rows.map(_._1).toSeq == (0 until TextAnalysis.VOCAB_CHECKPOINTS),
      "every checkpoint present, gap-free")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 > a._2, "docs_seen strictly increases")
      assert(b._4 >= a._4, "vocab_size never shrinks")
      assert(b._4 - a._4 == b._3, "vocab_size increments by new_tokens")
    }
    val d = graft.Tables.load(spark, dir, "documents")
    val totalDocs = d.count()
    val totalVocab = d
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t"))).collect()(0).getLong(0)
    assert(rows.last._2 == totalDocs, "docs_seen ends at the corpus size")
    assert(rows.last._4 == totalVocab, "vocab_size ends at the global vocab")
    assert(rows.map(_._3).sum == totalVocab, "new_tokens partition the vocab")
    // Heaps-law sanity on the fixture: later slices add fewer new tokens
    assert(rows.last._3 < rows.head._3,
      "novelty must decay from the first slice to the last")
  }

  test("consumption order is q89's: checkpoints = q89 ordinals re-sharded") {
    val ords = CorpusOps.q89ShardExport(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val n = ords.size.toLong
    val k = TextAnalysis.VOCAB_CHECKPOINTS
    // recompute each token's first checkpoint from q89's ordinals
    val expected = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("t"))
      .collect().map(r => (r.getString(1), ords(r.getLong(0)) * k / n))
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2).min }
    val perCk = expected.groupBy(_._2).map { case (ck, v) => ck -> v.size.toLong }
    val got = graft.CacheScope.run {
      TextAnalysis.q128VocabGrowth(spark, dir)
        .collect().map(r => r.getInt(0).toLong -> r.getLong(2)).toMap
    }
    (0L until k).foreach { ck =>
      assert(got(ck) == perCk.getOrElse(ck, 0L),
        s"checkpoint $ck new-token count drifted from the q89 order")
    }
  }
}
