package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming deduplication over a document stream (SURVEY §2.11 extension;
  * the training-data pipeline's ingest-time dedup): new document files
  * stream in, exact duplicates (by content hash) are dropped across
  * micro-batches with checkpointed state, unique documents append to the
  * clean sink.
  *
  * Scale: `dropDuplicatesWithinWatermark` keys state by the 128-bit
  * content hash and EXPIRES entries once the ingestion-time watermark
  * passes the retention delay — state is bounded by the dedup horizon
  * (documents arriving more than `retention` apart are treated as new),
  * which is the standard trade for unbounded streams. The same shape with
  * a minhash band column as the key gives streaming NEAR-dup candidate
  * suppression.
  */
object StreamingDedup {

  /** Exact streaming dedup: content-hash state with watermark-bounded
    * retention; unique docs append to `cleanPath`.
    */
  def run(spark: SparkSession, docDir: String, docSchema: org.apache.spark.sql.types.StructType,
          cleanPath: String, checkpoint: String,
          retention: String = "1 hour"): StreamingQuery = {
    val docs = spark.readStream
      .schema(docSchema)
      .parquet(docDir)
    docs
      .withColumn("content_hash", md5(col("text")))
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", retention)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("ingest_ts")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .format("parquet")
      .option("path", cleanPath)
      .start()
  }
}
