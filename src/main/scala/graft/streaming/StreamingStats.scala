package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-stats maintenance — the live half of q132's
  * materialized view: every document micro-batch contributes ONLY its own
  * (lang, source) partials (exact integer sums, the merge-able form) to a
  * batch-keyed segment dir; the view is a merge-on-read over all
  * segments. The historical corpus is never re-read, replays overwrite
  * their own segment (idempotent — the ledger convention), and the merge
  * is associative so segment arrival order is irrelevant. State is the
  * segment store, bounded by (#batches × #groups); a compactor could
  * fold old segments exactly (integer sums) without changing any read.
  */
object StreamingStats {

  /** Per-batch maintainer: partials into `statsPath/batch_<id>`. */
  def run(spark: SparkSession, docDir: String,
          docSchema: org.apache.spark.sql.types.StructType,
          statsPath: String, checkpoint: String,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .parquet(docDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TextAnalysis.statsPartials(batch)
          .write.mode("overwrite").parquet(s"$statsPath/batch_$batchId")
        ()
      }
      .start()

  private val BatchDir = "batch_(\\d+)".r
  private val CompactDir = "compact_(\\d+)".r

  /** (compacted segment covering ids ≤ hi if any, live batch dirs). */
  private def segments(spark: SparkSession,
                       statsPath: String): (Option[(Long, String)], Seq[String]) = {
    val p = new org.apache.hadoop.fs.Path(statsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (None, Nil)
    val dirs = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
    val compacts = dirs.flatMap(d => d.getName match {
      case CompactDir(hi) => Some(hi.toLong -> d.toString)
      case _ => None
    })
    val newest = compacts.sortBy(-_._1).headOption
    val hi = newest.map(_._1).getOrElse(-1L)
    // a batch dir covered by the compacted segment is EXCLUDED even if a
    // crashed compactor failed to delete it — additive partials would
    // otherwise double-count (contrast the block-scrub ledger, whose
    // seen-set semantics make leftovers harmless)
    val live = dirs.flatMap(d => d.getName match {
      case BatchDir(id) if id.toLong > hi => Some(d.toString)
      case _ => None
    })
    (newest, live.toSeq)
  }

  /** Merge-on-read: the current view = the newest compacted segment plus
    * every batch segment it does not cover.
    */
  def readStats(spark: SparkSession, statsPath: String): DataFrame = {
    val (compact, live) = segments(spark, statsPath)
    val paths = compact.map(_._2).toSeq ++ live
    TextAnalysis.finalizeStats(spark.read.parquet(paths: _*))
  }

  /** Fold the newest compacted segment and every live batch segment into
    * ONE `compact_<hi>` segment (hi = highest covered batch id), then
    * best-effort delete the covered dirs. EXACT: partials are integer
    * sums, so folding changes no read (spec-pinned across the fold and
    * across a simulated crash that leaves covered dirs behind). Run as
    * maintenance with no active maintainer — the one-writer contract;
    * readers are safe either way because covered ids are excluded by
    * name, so the delete is never load-bearing.
    */
  def compactStats(spark: SparkSession, statsPath: String): Unit = {
    val (compact, live) = segments(spark, statsPath)
    if (live.isEmpty) return
    val hi = live.map { d =>
      new org.apache.hadoop.fs.Path(d).getName match {
        case BatchDir(id) => id.toLong
      }
    }.max
    val inputs = compact.map(_._2).toSeq ++ live
    TextAnalysis.mergeStatsPartials(spark.read.parquet(inputs: _*))
      .write.mode("overwrite").parquet(s"$statsPath/compact_$hi")
    val fs = new org.apache.hadoop.fs.Path(statsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    inputs.foreach(d =>
      fs.delete(new org.apache.hadoop.fs.Path(d), true))
  }
}
