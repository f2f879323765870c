package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN serving against a MATERIALIZED residual IVF-PQ index
  * ([[graft.operators.Similarity.writeIvfPqIndex]]) — the realtime half
  * of q183, and the tier the measured occupancy law RECOMMENDS at 5M+
  * clustered vectors (SCALE.md r16: residual m=32 holds 0.967 recall@3
  * where raw-domain IVF-PQ reads 0.550 and flat PQ 0.000), so it must be
  * realtime-servable like its inferior siblings [[StreamingAnn]] /
  * [[StreamingIvf]] / [[StreamingSq8]].
  *
  * Per micro-batch: |batch| pure-map list picks over the stored
  * quantizer, a list_id equi-join into the stored code table, ADC
  * against centroid+codeword reconstructions at m bytes/candidate, and
  * the exact refine over the PQ_REFINE survivors — corpus floats are
  * touched only through the index's refine vectors, never rescanned.
  * The quantizer and residual codebook ride the closure (both bounded
  * by the recorded dials; resolved ONCE at query start, before the
  * fingerprint contract below).
  *
  * Sink idempotence (`batch_<id>` overwrite) and restart-on-rebuild
  * (meta fingerprint captured BEFORE the index frames resolve,
  * re-checked every batch) follow [[IndexServingStream]] verbatim; one
  * shared batch kernel ([[graft.operators.Similarity.ivfPqSearch]])
  * means streamed and batched probes can never disagree on quantizer,
  * codebook, reconstruction norms, or refine.
  */
object StreamingIvfPq {

  def runAgainstIndex(spark: SparkSession, probeDir: String,
                      probeSchema: org.apache.spark.sql.types.StructType,
                      indexPath: String, outPath: String,
                      checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, probeDir, probeSchema, indexPath,
      outPath, checkpoint, trigger) {
      val idx = graft.operators.Similarity.loadIvfPqIndex(spark, indexPath)
      batch => graft.operators.Similarity.ivfPqSearch(batch, idx)
    }
}
