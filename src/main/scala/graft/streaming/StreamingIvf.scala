package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN serving against a MATERIALIZED IVF index
  * ([[graft.operators.Similarity.writeIvfIndex]]) — completes the
  * serving symmetry: every materialized vector index (LSH, SQ8, IVF) now
  * has a streaming half running the SAME batch kernel per micro-batch.
  * Per-batch work is |batch| pure-map list picks + a list_id equi-join
  * into the stored inverted lists + the exact re-rank over the probed
  * fraction; the quantizer rides the closure (≤ IVF_K rows). Scaffold
  * contracts (fingerprint-before-load, per-batch restart-on-rebuild,
  * idempotent `batch_<id>` sinks) live in [[IndexServingStream]].
  */
object StreamingIvf {

  def runAgainstIndex(spark: SparkSession, probeDir: String,
                      probeSchema: org.apache.spark.sql.types.StructType,
                      indexPath: String, outPath: String,
                      checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, probeDir, probeSchema, indexPath,
      outPath, checkpoint, trigger) {
      val idx = graft.operators.Similarity.loadIvfIndex(spark, indexPath)
      batch => graft.operators.Similarity.ivfSearch(batch, idx)
    }
}
