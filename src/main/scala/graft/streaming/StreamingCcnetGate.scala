package graft.streaming

import graft.operators.CorpusOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming CCNet perplexity gate serving a MATERIALIZED target LM
  * ([[CorpusOps.writeCcnetIndex]]) — the ingest-time shape of q108/q109:
  * a nightly job freezes the target-slice bigram model and the tercile
  * boundaries; every arriving micro-batch is scored by the SAME batch
  * kernel ([[CorpusOps.ccnetAgainstLoaded]]) — model tables broadcast,
  * boundaries as plan literals — and labeled head/middle/tail with the
  * SAME tie rule. Batch parity is structural (one kernel definition);
  * fingerprint-before-load and restart-on-rebuild come from the shared
  * [[IndexServingStream]] scaffold.
  *
  * Scale: per-batch work is |batch| bigrams joined map-side into the
  * stored (target-sized, broadcast) count tables plus one doc_id
  * aggregate — the historical corpus participates only through the two
  * frozen parquet tables; no state, no watermark, checkpointed progress.
  */
object StreamingCcnetGate {

  def runAgainstIndex(spark: SparkSession, docDir: String, docSchema: StructType,
                      indexPath: String, outPath: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, docDir, docSchema, indexPath, outPath,
      checkpoint, trigger) {
      val idx = CorpusOps.loadCcnetIndex(spark, indexPath)
      batch => CorpusOps.ccnetAgainstLoaded(
        batch.select(batch.col("doc_id"), batch.col("text")), idx)
    }
}
