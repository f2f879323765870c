package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-stats maintenance — the live half of q132's
  * materialized view: every document micro-batch contributes ONLY its own
  * (lang, source) partials (exact integer sums, the merge-able form) to a
  * batch-keyed segment dir; the view is a merge-on-read over all
  * segments. The historical corpus is never re-read, replays overwrite
  * their own segment (idempotent — the ledger convention), and the merge
  * is associative so segment arrival order is irrelevant. State is the
  * segment store, bounded by (#batches × #groups); a compactor could
  * fold old segments exactly (integer sums) without changing any read.
  */
object StreamingStats {

  /** Per-batch maintainer: partials into `statsPath/batch_<id>`. */
  def run(spark: SparkSession, docDir: String,
          docSchema: org.apache.spark.sql.types.StructType,
          statsPath: String, checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .parquet(docDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TextAnalysis.statsPartials(batch)
          .write.mode("overwrite").parquet(s"$statsPath/batch_$batchId")
        ()
      }
      .start()

  /** Merge-on-read: the current view over every maintained segment. */
  def readStats(spark: SparkSession, statsPath: String): DataFrame =
    TextAnalysis.finalizeStats(
      spark.read.option("recursiveFileLookup", "true").parquet(statsPath))
}
