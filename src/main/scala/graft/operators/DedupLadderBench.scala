package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capacity ladder for the dedup/CC family (dev tool, run on demand;
  * results recorded in SCALE.md): the gated corpora stop at sf0.1
  * (5k docs), so this prices q44/q46/q58/q66/q77/q131 at 10×/100×/1000×
  * that size on a synthetic corpus matching the fixture's generative
  * shape — 31-token vocab, 10-100 tokens/doc, ~5% of docs carrying a
  * planted near-dup twin (2 token edits) and ~0.3% an exact twin (the
  * sf0.1 regime: 477 near-dup subgraph nodes / 5k docs, 8 exact pairs).
  *
  * What the ladder must prove (the r14 verdict's ask): the two-tier
  * connected-components boundary — driver union-find below
  * [[Dedup.CC_BOUNDARY_MAX_EDGES]] boundary edges, distributed min-label
  * propagation above — hands over at the measured crossover, by the
  * operator's OWN runtime decision (telemetry), not by assertion.
  * Tier decisions and boundary-edge counts ride each row of the output.
  *
  * Generation is deterministic (xxhash64 per (doc, slot) — no RNG
  * state), entirely distributed, and writes ordinary
  * `documents.parquet` dirs the production queries read unmodified.
  *
  * Usage: runMain graft.operators.DedupLadderBench [nDocs ...]
  */
object DedupLadderBench {

  /** The fixture CORE vocabulary (31 tokens — TESTDATA.md's documents
    * shape); ~30% of slots draw from it, the rest from a content
    * vocabulary that GROWS with the corpus (Heaps-law-ish,
    * max(1000, n/5) hashed ids). The growth matters: the first ladder
    * run generated pure 31-token soup, under which every document's
    * simhash collapses toward the same signature (a majority vote over
    * the same 31 token hashes) and the pair graph goes quadratic at ANY
    * signature width — a corpus-realism artifact, not a scale property.
    * Real corpora differentiate documents by content tokens; this
    * generator does too, while keeping the core-token statistics the
    * fixture queries expect.
    */
  private val Vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** nBase base docs + planted twins, as a documents-schema frame. */
  private[graft] def synthDocs(spark: SparkSession, nBase: Long): DataFrame = {
    val vocabCol = typedlit(Vocab)
    val contentVocab = math.max(1000L, nBase / 5)
    // doc d: len = 10 + hash(d)%91 tokens; slot j is a core token with
    // ~30% probability, else a content token from the growing space
    def tok(d: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      when(pmod(xxhash64(d, j, lit(1)), lit(10)) < 3,
        element_at(vocabCol, pmod(xxhash64(d, j), lit(31)).cast("int") + 1))
        .otherwise(concat(lit("w"), pmod(xxhash64(d, j), lit(contentVocab))))
    val base = spark.range(0, nBase)
      .select(col("id").as("doc_id"),
        transform(
          sequence(lit(0), pmod(xxhash64(col("id")), lit(91)).cast("int") + lit(9)),
          j => tok(col("id"), j)).as("toks"))
    // near-dup twin for ~5% of docs: replace the first two tokens (a
    // 2-token edit on a 10-100-token doc stays inside the q46 jaccard
    // verify threshold for most lengths — the planted pair regime)
    val near = base.filter(pmod(col("doc_id"), lit(20)) === 7)
      .select((col("doc_id") + nBase).as("doc_id"),
        concat(
          transform(slice(col("toks"), 1, 2),
            t => element_at(vocabCol,
              pmod(xxhash64(t, col("doc_id")), lit(31)).cast("int") + 1)),
          slice(col("toks"), 3, 1000000)).as("toks"))
    // exact twin for ~0.3% of docs
    val exact = base.filter(pmod(col("doc_id"), lit(333)) === 11)
      .select((col("doc_id") + 2 * nBase).as("doc_id"), col("toks"))
    base.unionByName(near).unionByName(exact)
      .select(col("doc_id"), concat_ws(" ", col("toks")).as("text"),
        element_at(typedlit(Seq("en", "zh", "es", "fr", "de")),
          pmod(xxhash64(col("doc_id"), lit(7)), lit(5)).cast("int") + 1).as("lang"),
        concat(lit("src"), pmod(col("doc_id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
  }

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val out = work
    (out, (System.nanoTime() - t0) / 1e9)
  }

  /** (name, per-rung cap, frame builder). The 16-BIT simhash family
    * (q58/q77/q131 at the fixture dial) is capped at 50k docs: 2^16
    * signatures saturate there (~8 docs/signature at 500k), the
    * hamming-≤3 band join goes quadratic in bucket occupancy, and the
    * first ladder run measured q58\@500k as a >13-minute runaway — the
    * measured form of SCALE.md's "at corpus scale the ladder runs on
    * wider simhash_bits". The `cc_simhash48` rung IS that fix, run at
    * every size: the same pipeline at 48 bits, where the signature
    * space never saturates. `cc_minhash` prices the CC tier crossover
    * on the minhash pair graph (boundary edges grow with planted
    * twins; past CC_BOUNDARY_MAX_EDGES the operator itself switches to
    * distributed propagation — the telemetry records its decision).
    */
  private def ladder(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Seq[(String, Long, () => DataFrame)] = {
    def q(name: String) = () => graft.SparkEntry.queries(name)(spark, dir)
    def docsDf = graft.Tables.load(spark, dir, "documents")
    Seq(
      ("q44_dedup_exact", Long.MaxValue, q("q44_dedup_exact")),
      ("q46_minhash_lsh", Long.MaxValue, q("q46_minhash_lsh")),
      ("q66_dedup_pipeline", Long.MaxValue, q("q66_dedup_pipeline")),
      ("q58_dedup_clusters_sim16", 50000L, q("q58_dedup_clusters")),
      ("q77_canonical_best_sim16", 50000L, q("q77_canonical_best")),
      ("q131_dedup_sensitivity_sim16", 50000L, q("q131_dedup_sensitivity")),
      // pigeonhole banding has its OWN capacity law: hamming ≤ h over b
      // bits means h+1 bands of b/(h+1) bits, and bucket occupancy is
      // n / 2^(b/(h+1)) — at 5M docs, 12-bit bands (48/h3) hold ~1220
      // docs each and the candidate join goes ~12B pairs (measured: the
      // first 5M run filled the disk). Scaling the corpus means scaling
      // BAND WIDTH: either wider signatures or a tighter hamming dial.
      ("cc_simhash48_h3", 500000L, () => Dedup.connectedComponents(
        Dedup.simhashNearDupPairs(docsDf, bits = 48, maxHamming = 3)
          .select(col("a_id"), col("b_id")),
        docsDf.select(col("doc_id").as("id")))),
      ("cc_simhash48_h1", Long.MaxValue, () => Dedup.connectedComponents(
        Dedup.simhashNearDupPairs(docsDf, bits = 48, maxHamming = 1)
          .select(col("a_id"), col("b_id")),
        docsDf.select(col("doc_id").as("id")))),
      ("cc_minhash", Long.MaxValue, () => Dedup.connectedComponents(
        Dedup.minhashNearDupPairs(docsDf).select(col("a_id"), col("b_id")),
        docsDf.select(col("doc_id").as("id")))))
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(50000L, 500000L, 5000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("dedup_ladder").toString
    // warmup at fixture scale: codegen/JIT for every ladder entry
    locally {
      val warmDir = s"$root/warm"
      synthDocs(spark, 5000L).write.mode("overwrite")
        .parquet(s"$warmDir/documents.parquet")
      ladder(spark, warmDir).foreach { case (_, _, mk) =>
        graft.CacheScope.run {
          mk().write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      graft.Telemetry.drain()
      ()
    }

    println("n_docs,query,secs,out_rows,telemetry")
    sizes.foreach { n =>
      val dir = s"$root/n$n"
      val (_, genSecs) = time {
        synthDocs(spark, n).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      }
      println(f"$n,generate,$genSecs%.1f,,")
      ladder(spark, dir).foreach { case (name, cap, mk) =>
        if (n <= cap) {
          graft.Telemetry.drain()
          val (rows, secs) = time {
            graft.CacheScope.run {
              val d = mk()
              d.write.format("noop").mode("overwrite").save()
              d.count()
            }
          }
          spark.catalog.clearCache()
          val tele = graft.Telemetry.drain()
            .filter(e => e.contains("boundary") || e.contains("tier")
              || e.contains("cc "))
            .mkString("; ").replace(",", " ")
          println(f"$n,$name,$secs%.1f,$rows,$tele")
        } else println(f"$n,$name,SKIPPED(capacity cap - see scaladoc),,")
      }
    }
    spark.stop()
  }
}
