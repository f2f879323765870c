package graft.streaming

import graft.operators.CorpusOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming hot-block scrub serving a MATERIALIZED hot list
  * ([[CorpusOps.writeHotBlockIndex]]) — the ingest-time shape of
  * q127/q130: a nightly job freezes the corpus's drop-all block list
  * (license banners, template footers); every arriving (doc_id, text)
  * micro-batch runs the SAME batch kernel
  * ([[CorpusOps.hotScrubAgainstLoaded]]) — block, broadcast-join the
  * tiny hot list, reassemble — so known boilerplate never reaches the
  * corpus. Contrast [[StreamingBlockScrub]]: that is the KEEP-FIRST
  * modality and must carry a growing seen-block ledger; the drop-all
  * gate is STATELESS because membership in a frozen list decides
  * everything, which is exactly why the C4 rule is the cheap one at
  * ingest. Batch parity is structural (one kernel definition);
  * fingerprint-before-load and restart-on-rebuild come from the shared
  * [[IndexServingStream]] scaffold.
  *
  * Scale: per-batch work is the batch's own block explode + one
  * broadcast membership join; the historical corpus participates only
  * through the stored hot list (tiny by construction). No state, no
  * watermark, checkpointed progress.
  */
object StreamingHotBlockGate {

  def runAgainstIndex(spark: SparkSession, docDir: String, docSchema: StructType,
                      indexPath: String, outPath: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, docDir, docSchema, indexPath, outPath,
      checkpoint, trigger) {
      val idx = CorpusOps.loadHotBlockIndex(spark, indexPath)
      batch => CorpusOps.hotScrubAgainstLoaded(
        batch.select(batch.col("doc_id"), batch.col("text")), idx)
    }
}
