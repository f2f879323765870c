package graft.streaming

import graft.operators.CorpusOps
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Per batch the ledger participates through q96's bloom→exact-verify
  * shape: each segment carries its own 128 KiB sketch, their OR gates
  * the batch's blocks map-side, and only the candidate hashes are
  * exact-verified — broadcast against the ledger scan, so the
  * corpus-lifetime state never shuffles (bucket it by hash and the
  * scan prunes too).
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
    // register BEFORE start: the stream runs on a CLONED session whose
    // function registry is snapshotted at query start — registering from
    // inside the first batch would leave `might_contain` unresolvable for
    // every later batch of the same query (the StreamingDedup convention)
    graft.functions.expressions.BloomFns.register(spark)
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

  /** Sketch dials per ledger segment: 128 KiB, ≲1% fp at 2^17 items —
    * identical across segments so the serialized sketches OR-merge
    * (`BloomFilter.mergeInPlace` requires matching bits/hashes).
    */
  private val EST_ITEMS = 1L << 17
  private val NUM_BITS = 1L << 20

  /** One micro-batch of the scrub, factored for direct spec access. */
  private[streaming] def scrubBatch(spark: SparkSession, batch: DataFrame,
                                    batchId: Long, outPath: String,
                                    ledgerPath: String): Unit = {
    // the batch's own session (the stream's CLONE inside foreachBatch):
    // every frame joined against the batch must be analyzed — and every
    // function resolved — on it, not on the outer session
    val bs = batch.sparkSession
    graft.functions.expressions.BloomFns.register(bs)
    val priorLedgers = listPriorLedgers(bs, ledgerPath, batchId)
    val ledger =
      if (priorLedgers.isEmpty)
        bs.createDataFrame(bs.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("h",
              org.apache.spark.sql.types.StringType))))
      else bs.read.parquet(priorLedgers: _*)
    graft.CacheScope.run {
      val blocks = CorpusOps.scrubBlocks(batch).withColumn("h", md5(col("btxt")))
      // Seen-set membership, q96's bloom→exact-verify shape applied to the
      // ledger: each segment stores its own 128 KiB sketch; their OR (tiny
      // driver bytes — segments × 128 KiB, read once per batch) gates the
      // batch's blocks MAP-SIDE, and only the surviving candidate hashes
      // (true hits + ~1% fp) are exact-verified — broadcast against the
      // ledger scan, so the corpus-lifetime state table NEVER SHUFFLES.
      // No false negatives, so `seen` is exact. Only the sketch-gated
      // path may broadcast (candidates are batch-bounded); a segment
      // missing its sketch degrades to the PLAIN hash-keyed join — the
      // ledger side must never be broadcast, it is corpus-lifetime state.
      val marked = mergedBloom(bs, priorLedgers) match {
        case Some(bytes) =>
          val candidates = blocks
            .filter(call_function("might_contain", lit(bytes), xxhash64(col("h"))))
            .select(col("h")).distinct()
          val seen = ledger.join(broadcast(candidates), Seq("h"))
            .select(col("h")).distinct()
          markKept(blocks, broadcast(seen.withColumn("seen", lit(true))))
        case None =>
          markKept(blocks, ledger.withColumn("seen", lit(true)))
      }
      val cachedMarked = graft.CacheScope.cache(marked)
      CorpusOps.scrubVerdicts(cachedMarked)
        .write.mode("overwrite").parquet(s"$outPath/batch_$batchId")
      // newly-seen hashes = the kept blocks' (within-batch dups share a
      // kept block's hash; ledger-dropped blocks are already present)
      val additions = graft.CacheScope.cache(
        cachedMarked.filter(col("keep")).select(col("h")).distinct())
      additions.write.mode("overwrite").parquet(s"$ledgerPath/ledger_$batchId")
      writeSegmentBloom(bs, additions, s"$ledgerPath/ledger_$batchId")
    }
  }

  /** The shared q103 keep rule with the ledger verdict folded in: left
    * join the seen set, then keep = not-seen AND first occurrence
    * (the one `CorpusOps.firstOccurrenceKeep` definition).
    */
  private def markKept(blocks: DataFrame, seen: DataFrame): DataFrame =
    CorpusOps.firstOccurrenceKeep(
      blocks.join(seen, Seq("h"), "left"), col("seen").isNull)

  /** The segment's sketch lives UNDER the segment dir as `_bloom` — the
    * underscore keeps parquet readers of the segment from listing it, and
    * an at-least-once replay overwrites segment data and sketch together.
    */
  private def writeSegmentBloom(spark: SparkSession, additions: DataFrame,
                                segmentPath: String): Unit = {
    val agg = additions
      .select(call_function("bloom_agg",
        xxhash64(col("h")), lit(EST_ITEMS), lit(NUM_BITS)).as("bf"))
      .head()
    val bytes = agg.getAs[Array[Byte]]("bf") match {
      case null => // empty additions: an all-zeros sketch keeps the fast path
        val empty = org.apache.spark.util.sketch.BloomFilter.create(EST_ITEMS, NUM_BITS)
        val bos = new java.io.ByteArrayOutputStream()
        empty.writeTo(bos); bos.toByteArray
      case b => b
    }
    import spark.implicits._
    Seq(bytes).toDF("bf").coalesce(1)
      .write.mode("overwrite").parquet(s"$segmentPath/_bloom")
  }

  /** OR-merge every prior segment's sketch (same dials by construction;
    * Spark's public sketch API round-trips the aggregate's serialization).
    * None when there are no prior segments or any segment lacks a sketch
    * (→ caller uses the plain hash-keyed ledger join).
    */
  private def mergedBloom(spark: SparkSession,
                          priorLedgers: Seq[String]): Option[Array[Byte]] = {
    if (priorLedgers.isEmpty) return None
    val fs = new org.apache.hadoop.fs.Path(priorLedgers.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!priorLedgers.forall(p =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$p/_bloom")))) return None
    val sketches = priorLedgers.map { p =>
      val bytes = spark.read.parquet(s"$p/_bloom").head().getAs[Array[Byte]]("bf")
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
    }
    val merged = sketches.reduce((a, b) => a.mergeInPlace(b))
    val bos = new java.io.ByteArrayOutputStream()
    merged.writeTo(bos)
    Some(bos.toByteArray)
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
