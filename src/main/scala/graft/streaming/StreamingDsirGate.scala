package graft.streaming

import graft.operators.CorpusOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming DSIR importance gate serving a MATERIALIZED LLR model
  * ([[CorpusOps.writeDsirIndex]]) — the ingest-time shape of q106/q113:
  * a nightly job freezes the hashed-bigram log-likelihood-ratio table
  * and the top-k selection threshold; every arriving micro-batch is
  * scored by the SAME batch kernel ([[CorpusOps.dsirAgainstLoaded]]) —
  * the bucket table broadcast, the threshold a plan literal — and
  * flagged `selected` with the SAME frozen rule. Features in buckets
  * the build never saw score the stored both-unseen smoothed ratio.
  * Batch parity is structural (one kernel definition);
  * fingerprint-before-load and restart-on-rebuild come from the shared
  * [[IndexServingStream]] scaffold.
  *
  * Scale: per-batch work is |batch| bigrams joined map-side into the
  * 4096-row model plus one doc_id aggregate — neither corpus side is
  * ever touched at serve time; no state, no watermark, checkpointed
  * progress.
  */
object StreamingDsirGate {

  def runAgainstIndex(spark: SparkSession, docDir: String, docSchema: StructType,
                      indexPath: String, outPath: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, docDir, docSchema, indexPath, outPath,
      checkpoint, trigger) {
      val idx = CorpusOps.loadDsirIndex(spark, indexPath)
      batch => CorpusOps.dsirAgainstLoaded(
        batch.select(batch.col("doc_id"), batch.col("text")), idx)
    }
}
