package graft.streaming

import graft.operators.CorpusOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming weighted-reservoir maintenance — the live half of q146's
  * Efraimidis–Spiliopoulou draw: every document micro-batch keys its own
  * rows with the SHARED q146 kernel and writes only its own batch-local
  * top-k to a batch-keyed segment dir; the current sample is a
  * merge-on-read top-k over all segments.
  *
  * Why this is exact (not approximate): the E–S key is content-addressed
  * (a per-doc md5 draw), so a document's key is the same whether it
  * arrives in batch 0 or batch 9, and top-k is associative — the global
  * top-k of a union equals the top-k of per-batch top-ks. The maintained
  * sample over any batch partition of the corpus is therefore
  * BIT-IDENTICAL to running q146 on the whole corpus at once
  * (StreamingSampleSpec pins this), which is the reservoir-sampling
  * guarantee without any driver-side reservoir or RNG state.
  *
  * State = the segment store, bounded by (#batches × k) ROWS — not by
  * corpus size. Replays overwrite their own segment (idempotent), and
  * top-k's idempotence makes even a double-counted row harmless
  * (contrast StreamingStats, whose additive partials must exclude
  * covered leftovers to avoid double counting; the same exclusion is
  * kept here purely so the topology matches the house convention).
  */
object StreamingSample {

  /** Per-batch maintainer: the batch's own top-k into
    * `samplePath/batch_<id>`.
    */
  def run(spark: SparkSession, docDir: String,
          docSchema: org.apache.spark.sql.types.StructType,
          samplePath: String, checkpoint: String,
          k: Int = CorpusOps.WS_K,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .parquet(docDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        CorpusOps.topKReservoir(CorpusOps.weightedKeys(batch), k)
          .write.mode("overwrite").parquet(s"$samplePath/batch_$batchId")
        ()
      }
      .start()

  private val BatchDir = "batch_(\\d+)".r
  private val CompactDir = "compact_(\\d+)".r

  /** (newest compacted segment if any, live batch dirs above its id). */
  private def segments(spark: SparkSession,
                       samplePath: String): (Option[String], Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(samplePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (None, Nil)
    val dirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
    val compacts = dirs.flatMap(d => d.getName match {
      case CompactDir(hi) => Some(hi.toLong -> d.toString)
      case _ => None
    })
    val newest = compacts.sortBy(-_._1).headOption
    val hi = newest.map(_._1).getOrElse(-1L)
    val live = dirs.flatMap(d => d.getName match {
      case BatchDir(id) if id.toLong > hi => Some(d.toString)
      case _ => None
    })
    (newest.map(_._2), live.toSeq)
  }

  /** Merge-on-read: global top-k over every live segment, presented in
    * q146's exact output shape (rank, doc_id, source, w, es_key).
    */
  def readSample(spark: SparkSession, samplePath: String,
                 k: Int = CorpusOps.WS_K): DataFrame = {
    val (compact, live) = segments(spark, samplePath)
    val paths = compact.toSeq ++ live
    CorpusOps.rankReservoir(
      CorpusOps.topKReservoir(spark.read.parquet(paths: _*), k))
  }

  /** Fold every live segment into ONE `compact_<hi>` segment holding just
    * the current top-k, then best-effort delete the covered dirs. EXACT
    * by top-k associativity, and uniquely for this maintainer the crash
    * case is doubly safe: a covered leftover holds rows the compact
    * segment either already contains (idempotent under duplicates) or
    * outranks. One-writer maintenance contract, same as StreamingStats.
    */
  def compactSample(spark: SparkSession, samplePath: String,
                    k: Int = CorpusOps.WS_K): Unit = {
    val (compact, live) = segments(spark, samplePath)
    if (live.isEmpty) return
    val hi = live.map { d =>
      new org.apache.hadoop.fs.Path(d).getName match {
        case BatchDir(id) => id.toLong
      }
    }.max
    val inputs = compact.toSeq ++ live
    CorpusOps.topKReservoir(spark.read.parquet(inputs: _*), k)
      .write.mode("overwrite").parquet(s"$samplePath/compact_$hi")
    val fs = new org.apache.hadoop.fs.Path(samplePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    inputs.foreach(d => fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }
}
