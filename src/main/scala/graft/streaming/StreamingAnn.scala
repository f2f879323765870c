package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN serving against a MATERIALIZED LSH index
  * ([[graft.operators.Similarity.writeAnnIndex]]) — the realtime half of
  * q82's serving shape: probe vectors stream in, each micro-batch runs the
  * BATCH index-search kernel
  * ([[graft.operators.Similarity.annAgainstIndex]]) and appends its
  * (p_id, c_id, cosine, rn) neighbors to the sink. One shared definition
  * means streamed and batched probes can never disagree on banding,
  * multiprobe expansion, or the re-rank; `foreachBatch` gives the batch
  * planner per micro-batch plus checkpointed file-source progress.
  *
  * Sink idempotence: foreachBatch is AT-LEAST-ONCE on failure retry, so
  * each batch OVERWRITES its own deterministic `batch_<id>` directory — a
  * replayed batch replaces rather than duplicates its neighbors. Readers
  * load the sink with `recursiveFileLookup=true` (the batch directories
  * are plain subdirs, not partition keys).
  *
  * Scale: per-batch work is |batch| × (bands × multiprobe masks) joins
  * into the stored band table — the corpus participates only through the
  * index parquet; no streaming state, no watermark, restart resumes from
  * the checkpoint with zero rebuild.
  */
object StreamingAnn {

  def runAgainstIndex(spark: SparkSession, probeDir: String,
                      probeSchema: org.apache.spark.sql.types.StructType,
                      indexPath: String, outPath: String,
                      checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    // fingerprint-before-load, per-batch restart-on-rebuild checks and
    // idempotent batch_<id> sinks all live in the shared scaffold
    IndexServingStream.run(spark, probeDir, probeSchema, indexPath,
      outPath, checkpoint, trigger) {
      val idx = graft.operators.Similarity.loadAnnIndex(spark, indexPath)
      batch => graft.operators.Similarity.annSearch(batch, idx)
    }
}
