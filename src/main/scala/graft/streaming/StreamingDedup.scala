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

  /** Streaming NEAR-dup suppression: state keys on the full 16-slot
    * minhash signature (word-3-gram shingles, the batch q46 hash family),
    * so textually near-identical documents — whitespace/ordering-invariant
    * at the shingle-set level — collapse to the first arrival even when
    * their raw bytes differ. Same bounded-state watermark semantics as the
    * exact variant; a stricter pipeline feeds survivors to the batch
    * LSH+verify pass (q66) for sub-signature similarity.
    */
  def runNearDup(spark: SparkSession, docDir: String,
                 docSchema: org.apache.spark.sql.types.StructType,
                 cleanPath: String, checkpoint: String,
                 retention: String = "1 hour"): StreamingQuery = {
    val sigU = udf((text: String) => {
      val tok = text.split(" ")
      if (tok.length < 3) {
        // no 3-gram exists: every short doc would share the empty
        // all-MaxValue signature and collapse onto the first arrival, so
        // key them by exact content instead
        "exact:" + graft.functions.PortableHash.md5Hex(text)
      } else {
        val mh = Array.fill(16)(Long.MaxValue)
        var i = 0
        while (i < tok.length - 2) {
          val s = s"${tok(i)} ${tok(i + 1)} ${tok(i + 2)}"
          var k = 0
          while (k < 16) {
            val h = graft.functions.PortableHash.md5Int60(s"$k:$s")
            if (h < mh(k)) mh(k) = h
            k += 1
          }
          i += 1
        }
        mh.mkString(",")
      }
    })
    spark.readStream
      .schema(docSchema)
      .parquet(docDir)
      .withColumn("minhash_sig", sigU(col("text")))
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", retention)
      .dropDuplicatesWithinWatermark("minhash_sig")
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
