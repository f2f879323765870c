package graft.streaming

import graft.operators.TimeSeries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming outlier census serving MATERIALIZED per-user med/MAD
  * boundaries ([[TimeSeries.writeOutlierIndex]]) — the telemetry-alert
  * shape of q136/q138: a nightly job freezes each user's robust
  * location/scale; every arriving (user_id, value) micro-batch runs the
  * SAME batch kernel ([[TimeSeries.outliersAgainstBounds]]) — one
  * user-keyed join against the user-bounded boundary table, zero
  * percentile work per batch — so a flaring star (or a misbehaving
  * metric) surfaces at ingest. Batch parity is structural (one kernel
  * definition); fingerprint-before-load and restart-on-rebuild come
  * from the shared [[IndexServingStream]] scaffold.
  *
  * Scale: per-batch work is |batch| joined against #users boundary
  * rows; the historical event stream participates only through the
  * frozen boundaries. No state, no watermark, checkpointed progress.
  */
object StreamingOutlierGate {

  def runAgainstIndex(spark: SparkSession, evDir: String, evSchema: StructType,
                      indexPath: String, outPath: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, evDir, evSchema, indexPath, outPath,
      checkpoint, trigger) {
      val bounds = TimeSeries.loadOutlierBounds(spark, indexPath)
      batch => TimeSeries.outliersAgainstBounds(
        batch.select(batch.col("user_id"), batch.col("value")), bounds)
    }
}
