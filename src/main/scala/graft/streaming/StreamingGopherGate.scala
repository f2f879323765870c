package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming Gopher gate — the ingest-time router for the q176 rule
  * battery: arriving documents are verdicted with the SAME in-row kernel
  * the batch audit uses ([[TextAnalysis.gopherVerdicts]] — one
  * definition, no threshold drift) and each micro-batch routes to the
  * pass or reject sink on the composite verdict.
  *
  * Scale: the rules are a pure per-row projection over the split arrays
  * (no state, no watermark — a verdict is a function of the row), so the
  * stream's only cost is the two appends; `foreachBatch` fans one
  * computed batch to both sinks without re-verdicting. The sinks carry
  * the FULL document row (text/lang/source/n_chars) plus the verdict
  * columns — [[TextAnalysis.gopherScored]], the StreamingQuality
  * keep-the-row convention — so the gate genuinely composes ahead of
  * [[StreamingQuality]] and [[StreamingDedup]] in an ingest pipeline:
  * all the stateless gates run first, the stateful dedup sees only
  * survivors, with their payload intact.
  */
object StreamingGopherGate {

  def run(spark: SparkSession, docDir: String, docSchema: StructType,
          passPath: String, rejectPath: String,
          checkpoint: String): StreamingQuery = {
    val docs = spark.readStream
      .schema(docSchema)
      .parquet(docDir)
    TextAnalysis.gopherScored(docs.toDF())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // idempotent restart: each micro-batch OVERWRITES its own
        // batch_id=N partition dir (the StreamingQuality convention), so
        // a crash between the two sink writes re-runs without duplicates
        val v = batch.cache()
        try {
          v.filter(col("passes"))
            .write.mode("overwrite").parquet(s"$passPath/batch_id=$batchId")
          v.filter(!col("passes"))
            .write.mode("overwrite").parquet(s"$rejectPath/batch_id=$batchId")
        } finally v.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
