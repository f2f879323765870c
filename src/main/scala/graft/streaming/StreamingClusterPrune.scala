package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming Minipile gate serving a MATERIALIZED cluster-prune index
  * ([[Similarity.writeClusterPruneIndex]]) — the ingest-time shape of
  * q114/q118: a nightly job freezes the seed centroids and the k-row
  * cluster verdicts; every arriving (doc_id, text, embedding) micro-batch
  * runs the SAME batch kernel ([[Similarity.clusterPruneAgainstLoaded]])
  * — assignment a pure map over the stored centroids, quality the q88
  * per-row score, verdict a broadcast join against the k-row table — so
  * a doc from a known spam pocket is dropped at ingest, before it ever
  * reaches the corpus. Batch parity is structural (one kernel
  * definition); fingerprint-before-load and restart-on-rebuild come from
  * the shared [[IndexServingStream]] scaffold.
  *
  * Scale: per-batch work is |batch| × k distance ops + the broadcast
  * verdict join — the historical corpus participates only through the
  * two frozen parquet tables; no state, no watermark, checkpointed
  * progress.
  */
object StreamingClusterPrune {

  def runAgainstIndex(spark: SparkSession, docDir: String, docSchema: StructType,
                      indexPath: String, outPath: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, docDir, docSchema, indexPath, outPath,
      checkpoint, trigger) {
      val idx = Similarity.loadClusterPruneIndex(spark, indexPath)
      batch => Similarity.clusterPruneAgainstLoaded(
        batch.select(batch.col("doc_id"), batch.col("text"),
          batch.col("embedding")), idx)
    }
}
