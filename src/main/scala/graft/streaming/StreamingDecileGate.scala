package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming top-quality selection serving STORED decile boundaries — the
  * q81/q82/q83 serving pattern applied to q88: a nightly batch job
  * materializes the corpus's nine quality-score boundaries; the ingest
  * stream scores each document with the SAME shared kernel
  * ([[TextAnalysis.qualityScored]]), buckets it against the stored
  * boundaries with the SAME tie rule ([[TextAnalysis.decileOf]]), and
  * routes the top-quality slice to the keep sink.
  *
  * Like the index-serving paths, boundaries are resolved ONCE at query
  * start (9 doubles of driver state riding the closure) — per-batch work
  * is a pure per-row map plus two appends. The restart-on-rebuild
  * contract is ENFORCED the way the band/ANN/IVF indexes enforce it: the
  * build carries [[graft.operators.IndexMeta]] with a per-build nonce,
  * the gate fingerprints it before loading, and every micro-batch
  * re-checks — a re-materialized boundary build under a running stream
  * fails the next batch loudly instead of being served stale.
  */
object StreamingDecileGate {

  /** Materialize the decile boundaries of `dir`'s documents corpus —
    * the batch half of the serving pair (one aggregate, one tiny file).
    * Meta LAST (the index-completeness convention): meta presence marks
    * the build complete, and the per-build nonce makes ANY
    * re-materialization invalidate a running gate's fingerprint. Written
    * first, the meta would open the inverse race with no recovery — a
    * gate starting DURING a rebuild would capture the new nonce over the
    * old bounds and serve them forever with every check passing.
    */
  def writeBoundaries(spark: SparkSession, dir: String, outPath: String): Unit = {
    // invalidate first: a rebuild that crashes mid-write must leave a
    // meta-less (refused) dir, never new bounds under the old meta
    graft.operators.IndexMeta.invalidate(spark, outPath)
    TextAnalysis.decileBoundaries(
      TextAnalysis.qualityScored(graft.Tables.load(spark, dir, "documents")))
      .write.mode("overwrite").parquet(s"$outPath/bounds")
    graft.operators.IndexMeta.write(spark, outPath, "graft decile boundaries",
      "kind" -> "decile_boundaries", "score" -> "distinct_ratio",
      "probs" -> "0.1..0.9")
  }

  def run(spark: SparkSession, docDir: String, docSchema: StructType,
          boundariesPath: String, keepPath: String, restPath: String,
          checkpoint: String, minDecile: Int = 9,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // resolved ONCE: 9 doubles, baked into the per-batch plan as a
    // literal. Fingerprint BEFORE the read (the StreamingAnn ordering), so
    // a rebuild racing the load fails the first batch loudly; each batch
    // re-checks and fails instead of serving retired boundaries.
    val loadedFp = graft.operators.IndexMeta.fingerprint(spark, boundariesPath)
    val bs: Seq[Double] =
      spark.read.parquet(s"$boundariesPath/bounds").head().getSeq[Double](0)
    val bsCol = array(bs.map(lit): _*)
    val docs = spark.readStream.schema(docSchema).parquet(docDir)
    TextAnalysis.qualityScored(docs.toDF())
      .withColumn("decile", TextAnalysis.decileOf(col("score"), bsCol))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.IndexMeta.requireUnchanged(spark, boundariesPath, loadedFp)
        // idempotent batch_id=N overwrite, the shared sink contract
        val scored = batch.cache()
        try {
          scored.filter(col("decile") >= minDecile)
            .write.mode("overwrite").parquet(s"$keepPath/batch_id=$batchId")
          scored.filter(col("decile") < minDecile)
            .write.mode("overwrite").parquet(s"$restPath/batch_id=$batchId")
        } finally scored.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
