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
  * is a pure per-row map plus two appends. A re-materialized boundary
  * file under a running stream is served only after restart, the same
  * restart-on-rebuild contract the band/ANN/IVF indexes pin.
  */
object StreamingDecileGate {

  /** Materialize the decile boundaries of `dir`'s documents corpus —
    * the batch half of the serving pair (one aggregate, one tiny file).
    */
  def writeBoundaries(spark: SparkSession, dir: String, outPath: String): Unit =
    TextAnalysis.decileBoundaries(
      TextAnalysis.qualityScored(graft.Tables.load(spark, dir, "documents")))
      .write.mode("overwrite").parquet(outPath)

  def run(spark: SparkSession, docDir: String, docSchema: StructType,
          boundariesPath: String, keepPath: String, restPath: String,
          checkpoint: String, minDecile: Int = 9): StreamingQuery = {
    // resolved ONCE: 9 doubles, baked into the per-batch plan as a literal
    val bs: Seq[Double] =
      spark.read.parquet(boundariesPath).head().getSeq[Double](0)
    val bsCol = array(bs.map(lit): _*)
    val docs = spark.readStream.schema(docSchema).parquet(docDir)
    TextAnalysis.qualityScored(docs.toDF())
      .withColumn("decile", TextAnalysis.decileOf(col("score"), bsCol))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
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
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
