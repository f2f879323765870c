package graft

import org.apache.spark.sql.functions._

/** The corpus builder materializes exactly what its gated stages decide:
  * manifest counts partition the input, the written corpus matches the
  * manifest, splits/shards are well-formed, and the build is
  * deterministic end to end.
  */
class CorpusBuildSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("corpus build: manifest partitions the input, output matches, deterministic") {
    val out1 = java.nio.file.Files.createTempDirectory("corpusbuild").toString
    val m = CorpusBuild.materialize(spark, sf, out1)

    // verdict counts partition the corpus (q100's contract, re-stated
    // over the materialized artifact)
    assert(m("n_quality_flagged") + m("n_contaminated") + m("n_dups") +
      m("n_kept") == m("n_input"), s"verdicts do not partition: $m")
    assert(m("n_curated") + m("n_fully_scrubbed_dropped") == m("n_kept"), s"$m")
    assert(m("n_curated") > 0, "build must keep something")
    assert(m("n_blocks_removed") <= m("n_blocks_total"), s"$m")

    val corpus = spark.read.parquet(s"$out1/corpus").cache()
    assert(corpus.count() == m("n_curated"), "written rows == manifest")
    assert(corpus.filter(length(col("text")) === 0).count() == 0, "no empty text")
    val splits = corpus.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")), s"splits: $splits")
    // shards balanced within one row over the curated set (q89's property)
    val sizes = corpus.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: ${sizes.toSeq}")
    // ordinals are a gap-free permutation of the curated set
    val agg = corpus.agg(min(col("ordinal")), max(col("ordinal")),
      countDistinct(col("ordinal"))).head()
    assert(agg.getLong(0) == 0L && agg.getLong(1) == m("n_curated") - 1 &&
      agg.getLong(2) == m("n_curated"), s"ordinals: $agg")

    // untouched survivors carry their original text verbatim
    val orig = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text").as("orig"))
    val untouched = corpus.filter(col("n_removed") === 0)
      .join(orig, Seq("doc_id"))
    assert(untouched.count() > 0)
    assert(untouched.filter(col("text") =!= col("orig")).count() == 0,
      "clean docs must round-trip verbatim")

    // manifest file exists and carries the same numbers
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out1/manifest.json")), "UTF-8")
    m.foreach { case (k, v) =>
      assert(json.contains(s""""$k": $v"""), s"manifest.json missing $k=$v")
    }

    // deterministic: a second build produces the identical curated set
    val out2 = java.nio.file.Files.createTempDirectory("corpusbuild2").toString
    val m2 = CorpusBuild.materialize(spark, sf, out2)
    assert(m2 == m, "manifest drifted between identical builds")
    val c2 = spark.read.parquet(s"$out2/corpus")
    val key1 = corpus.select(col("doc_id"), md5(col("text")).as("h"),
      col("split"), col("shard"))
    val key2 = c2.select(col("doc_id"), md5(col("text")).as("h"),
      col("split"), col("shard"))
    assert(key1.except(key2).count() == 0 && key2.except(key1).count() == 0,
      "curated set not deterministic")
    spark.catalog.clearCache()
  }
}
