package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus build as a runnable artifact producer — what a
  * user points at a raw document table to get a TRAINING SET out, not
  * just verdicts: q100's ingest pipeline (quality gate → bloom
  * decontamination → exact dedup) decides which documents survive,
  * q103's block scrub rewrites the survivors' text with cross-document
  * duplicate spans removed, q80's content-hash rule assigns
  * train/valid/test, q89's two-pass ordinal assigns balanced shards,
  * and the result lands as `corpus/` parquet partitioned by split with
  * a stage-by-stage `manifest.json`.
  *
  * Every stage is the SAME shared kernel its driver query gates
  * (q100/q103/q80/q89 — nothing here can drift from the hash-matched
  * definitions), and every exchange keeps its audited shape: verdicts
  * and scrub key by id/hash, the split is a pure projection, the shard
  * ordinal shuffles once by bucket.
  *
  * Usage: `runMain graft.CorpusBuild <sfDir> <outDir>`.
  */
object CorpusBuild {

  def materialize(spark: SparkSession, sfDir: String,
                  outDir: String): Map[String, Long] = CacheScope.run {
    val d = Tables.load(spark, sfDir, "documents")
    val corpus = d.filter(col("source") =!= "src0")
    val verdicts = CacheScope.cache(
      operators.CorpusOps.q100IngestPipeline(spark, sfDir))

    // survivors of the ingest pipeline, with their metadata
    val survivors = CacheScope.cache(
      corpus.select(col("doc_id"), col("text"), col("lang"), col("source"))
        .join(verdicts.filter(col("kept")).select(col("doc_id")), Seq("doc_id")))

    // q103's scrub, materializing the TEXT (same kernels: block explode,
    // hash-keyed first-occurrence window, in-row reassembly)
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("idx"))
    val scrubbed = CacheScope.cache(
      operators.CorpusOps.scrubBlocks(survivors)
        .withColumn("h", md5(col("btxt")))
        .withColumn("keep", row_number().over(w) === 1)
        .groupBy(col("doc_id"))
        .agg(operators.CorpusOps.scrubAssembled.as("text"),
          count(lit(1)).as("n_blocks"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed")))

    // a fully-scrubbed doc contributes no text — drop it, count it
    val nonEmpty = CacheScope.cache(scrubbed.filter(length(col("text")) > 0))

    // q80's content-hash split over the CURATED text + q89's shard ordinal
    val bucket = pmod(conv(substring(md5(col("text")), 1, 15), 16, 10)
      .cast("long"), lit(100))
    val curated = nonEmpty
      .join(survivors.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .withColumn("split",
        when(bucket < 90, "train").when(bucket < 95, "valid").otherwise("test"))
      .join(operators.CorpusOps.shardOrdinals(nonEmpty.select(col("doc_id"))),
        Seq("doc_id"))
    curated
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_blocks"), col("n_removed"), col("split"), col("shard"),
        col("ordinal"))
      .write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")

    val v = verdicts.groupBy().agg(
      count(lit(1)).as("n_input"),
      sum(when(col("quality_flagged"), 1L).otherwise(0L)).as("flagged"),
      sum(when(col("contaminated"), 1L).otherwise(0L)).as("contaminated"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("dups"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept")).head()
    val scrubAgg = scrubbed.agg(
      coalesce(sum(col("n_blocks")), lit(0L)),
      coalesce(sum(col("n_removed")), lit(0L))).head()
    val manifest = Map(
      "n_input" -> v.getLong(0),
      "n_quality_flagged" -> v.getLong(1),
      "n_contaminated" -> v.getLong(2),
      "n_dups" -> v.getLong(3),
      "n_kept" -> v.getLong(4),
      "n_blocks_total" -> scrubAgg.getLong(0),
      "n_blocks_removed" -> scrubAgg.getLong(1),
      "n_fully_scrubbed_dropped" -> (v.getLong(4) - nonEmpty.count()),
      "n_curated" -> nonEmpty.count())
    writeManifest(spark, s"$outDir/manifest.json", manifest)
    manifest
  }

  private def writeManifest(spark: SparkSession, path: String,
                            m: Map[String, Long]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (k, n) => s"""  "$k": $n""" }.mkString("{\n", ",\n", "\n}\n")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .appName("graft-corpus-build")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try println(materialize(spark, sfDir, outDir))
    finally spark.stop()
  }
}
