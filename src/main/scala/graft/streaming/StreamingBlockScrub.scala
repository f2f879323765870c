package graft.streaming

import graft.operators.CorpusOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming duplicate-span scrubbing — q103's transform applied at
  * ingest: each arriving document is partitioned into the SAME
  * 64-token blocks ([[CorpusOps.scrubBlocks]] — one shared definition),
  * blocks whose content was already seen in ANY earlier batch are
  * removed, within-batch duplicates keep q103's (doc_id, idx)
  * first-occurrence rule, and per-doc verdicts
  * (n_blocks, n_removed, scrubbed_md5) land in an idempotent
  * `batch_<id>` sink. Across batches, first ARRIVAL wins — the
  * streaming analog of q103's global (doc_id, idx) order.
  *
  * State is a distributed parquet LEDGER of seen block hashes, not an
  * executor state store: corpus-scale dedup state (10^10+ distinct
  * blocks at 100 TB) outgrows any per-executor store, but a
  * hash-partitioned table joins at whatever the cluster scans — the
  * q79/q81 incremental-index story with a state table that GROWS.
  * Per batch the ledger participates through one hash-keyed equi-join
  * (bucket the ledger by hash to make its side exchange-free, or gate
  * with a q96-style bloom sketch to prune the probe — both orthogonal
  * to the semantics here).
  *
  * Replay safety: `foreachBatch` is at-least-once, so BOTH writes are
  * keyed by batch id and overwrite — and the ledger read excludes the
  * current batch's own ledger dir, so a replayed batch that already
  * appended its hashes does not scrub itself against them (the verdict
  * is a pure function of the batch plus STRICTLY EARLIER batches).
  */
object StreamingBlockScrub {

  /** Ledger additions live under `ledger_<id>`; verdicts under
    * `batch_<id>`. Readers load verdicts with recursiveFileLookup.
    */
  def run(spark: SparkSession, docDir: String, docSchema: StructType,
          outPath: String, ledgerPath: String, checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spark.readStream
      .schema(docSchema)
      .parquet(docDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scrubBatch(spark, batch, batchId, outPath, ledgerPath)
      }
      .start()
  }

  /** One micro-batch of the scrub, factored for direct spec access. */
  private[streaming] def scrubBatch(spark: SparkSession, batch: DataFrame,
                                    batchId: Long, outPath: String,
                                    ledgerPath: String): Unit = {
    val priorLedgers = listPriorLedgers(spark, ledgerPath, batchId)
    val ledger =
      if (priorLedgers.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("h",
              org.apache.spark.sql.types.StringType))))
      else spark.read.parquet(priorLedgers: _*)
    graft.CacheScope.run {
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("idx"))
      // cached: feeds the verdict aggregate AND the ledger addition
      val marked = graft.CacheScope.cache(
        CorpusOps.scrubBlocks(batch)
          .withColumn("h", md5(col("btxt")))
          .join(ledger.withColumn("seen", lit(true)), Seq("h"), "left")
          .withColumn("keep",
            col("seen").isNull && row_number().over(w) === 1))
      CorpusOps.scrubVerdicts(marked)
        .write.mode("overwrite").parquet(s"$outPath/batch_$batchId")
      // newly-seen hashes = the kept blocks' (within-batch dups share a
      // kept block's hash; ledger-dropped blocks are already present)
      marked.filter(col("keep")).select(col("h")).distinct()
        .write.mode("overwrite").parquet(s"$ledgerPath/ledger_$batchId")
    }
  }

  private def listPriorLedgers(spark: SparkSession, ledgerPath: String,
                               batchId: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("ledger_"))
      .filter(_.getPath.getName.stripPrefix("ledger_").toLong < batchId)
      .map(_.getPath.toString)
  }
}
