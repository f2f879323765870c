package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices BM25 index MAINTENANCE at the 10⁸-term contract's scale model
  * (dev tool, run on demand; results recorded in SCALE.md): the same
  * synthetic wide vocabulary as the r14 serve measurement (200k docs ×
  * 40 uniformly-hashed tokens → ~6.4M distinct terms), built as EIGHT
  * appended deltas so the index sits in the fragmented state a real
  * ingest leaves, then:
  *
  *   1. a 3-term `bm25TopKForTerms` serve against the 8-segment index —
  *      wall + actual bytes read for the postings scan (each segment is
  *      token-sorted internally, so pruning works per segment but pays
  *      8× the row groups and footers);
  *   2. `compactBm25` — the token-sort restore cost (the full
  *      postings re-sort is the dominant term, priced here);
  *   3. the same serve against the single compacted segment — the
  *      pruning payoff, same bytes metric.
  *
  * Bytes are the engine's own task `inputMetrics.bytesRead` summed over
  * the isolated postings-scan action (df/stats reads excluded by
  * construction), so "row-group pruning effectiveness" is measured, not
  * inferred from plan text.
  *
  * Usage: runMain graft.operators.Bm25WideVocabBench [nDocs tokensPerDoc vocab]
  */
object Bm25WideVocabBench {

  private final class BytesCounter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) { bytes.addAndGet(m.inputMetrics.bytesRead); () }
    }
  }

  private def quiesce(c: BytesCounter): Unit = {
    var last = c.bytes.get
    var i = 0
    while (i < 20) {
      Thread.sleep(5)
      val now = c.bytes.get
      if (now == last) i = 20 else { last = now; i += 1 }
    }
  }

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val out = work
    (out, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val perDoc = if (args.length > 1) args(1).toInt else 40
    val vocab = if (args.length > 2) args(2).toLong else 8000000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counter = new BytesCounter
    spark.sparkContext.addSparkListener(counter)

    // deterministic wide-vocab corpus: token j of doc d is a uniform
    // hash of (d, j) into the vocab id space — xxhash64, no RNG state
    val docs = spark.range(0, nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(perDoc - 1)),
          j => concat(lit("t"),
            pmod(xxhash64(col("id"), j), lit(vocab))))).as("text"))

    val tmp = java.nio.file.Files.createTempDirectory("bm25wide").toString
    val idx = s"$tmp/index"
    val segDocs = nDocs / 8
    val (_, buildSecs) = time {
      Bm25.writeBm25Index(docs.filter(col("doc_id") < segDocs), idx)
      (1 to 7).foreach { k =>
        Bm25.appendBm25Delta(docs.filter(
          col("doc_id") >= k * segDocs &&
            col("doc_id") < (k + 1) * segDocs), idx)
      }
    }
    println(f"build: 8 segments, $nDocs docs x $perDoc tokens in $buildSecs%.1f s")

    // pick 3 real terms deterministically from the corpus recipe
    val terms = (0 to 2).map(k =>
      docs.filter(col("doc_id") === k * 1000)
        .select(split(col("text"), " ").getItem(k)).head().getString(0))
    println(s"query terms: ${terms.mkString(", ")}")

    def postingsDirs: Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/postings")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).toSeq.map(_.getPath.toString)
    }
    // the isolated postings read: the exact scan bm25TopKForTerms runs,
    // without the df/stats reads polluting the bytes metric
    def postingsScanBytes(): (Long, Long, Double) = {
      quiesce(counter)
      val b0 = counter.bytes.get
      val (rows, secs) = time {
        spark.read.parquet(postingsDirs: _*)
          .filter(col("token").isin(terms: _*)).count()
      }
      quiesce(counter)
      (rows, counter.bytes.get - b0, secs)
    }
    def serve(): Double = {
      val (_, secs) = time {
        Bm25.bm25TopKForTerms(spark, idx, terms)
          .write.format("noop").mode("overwrite").save()
      }
      secs
    }

    serve() // warm the serve path (codegen, footers)
    val preServe = serve()
    val (preRows, preBytes, preScanSecs) = postingsScanBytes()
    println(f"pre-compact:  serve $preServe%.2f s; postings scan $preRows rows, " +
      f"${preBytes / 1048576.0}%.1f MiB read, $preScanSecs%.2f s (8 segments)")

    val (_, compactSecs) = time(Bm25.compactBm25(spark, idx))
    val totalPostings = spark.read.parquet(postingsDirs: _*).count()
    println(f"compact: $compactSecs%.1f s (token-sort restore over $totalPostings postings)")

    serve() // re-warm (fresh files)
    val postServe = serve()
    val (postRows, postBytes, postScanSecs) = postingsScanBytes()
    println(f"post-compact: serve $postServe%.2f s; postings scan $postRows rows, " +
      f"${postBytes / 1048576.0}%.1f MiB read, $postScanSecs%.2f s (1 segment)")
    assert(preRows == postRows, "compaction changed the matched postings")
    spark.stop()
  }
}
