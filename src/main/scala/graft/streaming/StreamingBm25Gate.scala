package graft.streaming

import graft.operators.Bm25
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming BM25 routing against a MATERIALIZED index
  * ([[Bm25.writeBm25Index]]) — the alerting/reverse-search shape: a
  * nightly build freezes the corpus statistics (df, N, Σdl) and the
  * standing query's term set; every arriving (doc_id, text) micro-batch
  * tokenizes ITSELF and scores against those frozen terms with the SAME
  * integer-unit kernel ([[Bm25.scoreNewDocs]] → `scoreMatched`) the
  * batch serve path uses, so stream and batch cannot drift on the
  * formula, rounding, or the term set. New docs matching the standing
  * query surface at ingest — the corpus is never re-read.
  *
  * Scale: per-batch work is the batch's own explode + a broadcast join
  * with the ≤ 3-term frame; stateless, checkpointed progress,
  * fingerprint-before-load and restart-on-rebuild from the shared
  * [[IndexServingStream]] scaffold.
  */
object StreamingBm25Gate {

  def runAgainstIndex(spark: SparkSession, docDir: String, docSchema: StructType,
                      indexPath: String, outPath: String, checkpoint: String,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IndexServingStream.run(spark, docDir, docSchema, indexPath, outPath,
      checkpoint, trigger) {
      val (_, dfTable, n, sumDl) = Bm25.loadBm25Index(spark, indexPath)
      // the term set resolves ONCE into a local relation: per-batch work
      // must not re-rank the stored vocabulary table
      val resolved = Bm25.queryTerms(dfTable)
      val termsDf = spark.createDataFrame(
        java.util.Arrays.asList(resolved.collect(): _*), resolved.schema)
      batch => Bm25.scoreNewDocs(
        batch.select(batch.col("doc_id"), batch.col("text")), termsDf, n, sumDl)
    }
}
