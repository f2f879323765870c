package graft.streaming

import graft.operators.BloomGate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming decontamination gate serving a STORED bloom index
  * ([[BloomGate.writeBloomIndex]]) — the ingest-time shape of q96/q97: a
  * nightly job materializes the blocklist's sketch + exact gram table;
  * every arriving micro-batch is grammed at the STORED width, gated
  * map-side by the sketch (a plan literal — `numBits/8` bytes of driver
  * state resolved once), and exact-verified against the stored grams.
  * Batch parity is structural: the per-batch kernel IS
  * [[BloomGate.decontaminateAgainstLoaded]], the same definition the
  * batch queries run, closed over the index resolved once at query
  * start. Fingerprint-before-load and restart-on-rebuild come from the
  * shared [[IndexServingStream]] scaffold.
  */
object StreamingBloomGate {

  def runAgainstIndex(spark: SparkSession, docDir: String, docSchema: StructType,
                      indexPath: String, outPath: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, docDir, docSchema, indexPath, outPath,
      checkpoint, trigger) {
      val idx = BloomGate.loadBloomIndex(spark, indexPath)
      batch => BloomGate.decontaminateAgainstLoaded(batch, idx)
    }
}
