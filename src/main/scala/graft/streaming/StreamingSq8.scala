package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming vector search against a MATERIALIZED SQ8 index
  * ([[graft.operators.Similarity.writeSq8Index]]) — the realtime half of
  * q91's serving shape, and the memory-light sibling of [[StreamingAnn]]:
  * probe vectors stream in, each micro-batch runs the BATCH asymmetric
  * kernel ([[graft.operators.Similarity.sq8Search]]) over the stored
  * 8-bit code table and appends its (p_id, c_id, cosine, rn) neighbors.
  * One shared definition means streamed and batched probes can never
  * disagree on the quantizer, the reconstruction, or the re-rank.
  *
  * Scale: per-batch work is |batch| × |codes| asymmetric dots over 1 B/dim
  * codes — a quarter of the bytes the float corpus would move, which is
  * what keeps the scan memory-resident on a serving executor. The corpus
  * participates only through the index parquet; no streaming state, no
  * watermark, restart resumes from the checkpoint with zero rebuild.
  *
  * Sink idempotence and restart-on-rebuild follow [[StreamingAnn]]
  * verbatim: `batch_<id>` overwrite per micro-batch; the meta fingerprint
  * is captured BEFORE the index frames resolve and re-checked every
  * batch, so a rebuild under a running query fails loudly instead of
  * silently serving the retired build's quantizer.
  */
object StreamingSq8 {

  def runAgainstIndex(spark: SparkSession, probeDir: String,
                      probeSchema: org.apache.spark.sql.types.StructType,
                      indexPath: String, outPath: String,
                      checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, probeDir, probeSchema, indexPath,
      outPath, checkpoint, trigger) {
      val idx = graft.operators.Similarity.loadSq8Index(spark, indexPath)
      batch => graft.operators.Similarity.sq8Search(batch, idx)
    }
}
