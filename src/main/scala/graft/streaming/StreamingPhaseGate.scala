package graft.streaming

import graft.operators.TimeSeries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming phase-residual gate serving the MATERIALIZED period/template
  * index ([[TimeSeries.writePhaseIndex]]) — the transient-alert shape of
  * q140/q141: a nightly job runs the period grid search, folds each
  * star's template, and freezes the robust scale; every arriving
  * (user_id, event_id, ts, value) micro-batch runs the SAME batch kernel
  * ([[TimeSeries.phaseResidualsAgainstIndex]]) — two user-bounded joins
  * and the shared fold arithmetic, ZERO grid search or percentile work
  * per batch — so an eclipse-depth change or phase-shifted transient
  * surfaces at ingest against the star's own phase-level expectation
  * (q136's global census can't see it: the curve's intrinsic spread
  * absorbs a residual the per-bin mean exposes). Batch parity is
  * structural (one kernel definition); fingerprint-before-load and
  * restart-on-rebuild come from the shared [[IndexServingStream]]
  * scaffold.
  */
object StreamingPhaseGate {

  def runAgainstIndex(spark: SparkSession, evDir: String, evSchema: StructType,
                      indexPath: String, outPath: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, evDir, evSchema, indexPath, outPath,
      checkpoint, trigger) {
      val (period, template) = TimeSeries.loadPhaseIndex(spark, indexPath)
      batch => TimeSeries.phaseResidualsAgainstIndex(
        batch.select(batch.col("user_id"), batch.col("event_id"),
          batch.col("ts"), batch.col("value")), period, template)
    }
}
