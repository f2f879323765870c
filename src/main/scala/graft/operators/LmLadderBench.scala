package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Capacity ladder for the language-model-statistics family (dev tool,
  * run on demand; results recorded in SCALE.md): the gated corpora stop
  * at sf0.1 (5k docs), so this prices the type-table operators at
  * 10×/100×/1000× that size on [[DedupLadderBench.synthDocs]] — the same
  * Heaps-law corpus the dedup ladder runs (content vocabulary grows as
  * max(1000, n/5)), which is the property that matters here: every
  * operator in this family exchanges TYPE tables (distinct n-grams),
  * not token streams, so the claim under test is that their shuffles
  * grow with the VOCABULARY (sublinear in corpus size per Heaps) while
  * the token-side work stays one map pass.
  *
  * What each rung must show:
  * - q162 zipf / q128 vocab-growth / q117 ngram-diversity: unigram /
  *   per-prefix type tables — exchanges ∝ types.
  * - q149 Good–Turing: count-of-counts — two tiers of map-side partials
  *   (tokens → types → frequencies-of-frequencies), the smallest
  *   possible second exchange.
  * - q151 Kneser–Ney: bigram + continuation type tables — the family's
  *   expensive tail; its scale dial is the skew-salt gate on head
  *   tokens (telemetried), which a growing corpus must eventually trip.
  * - q152 collocations (PMI): bigram type table joined to two unigram
  *   tables — broadcast-ability of the unigram side is the thing that
  *   dies at scale; the measurement prices when.
  * - q150 / q133: the sketch tier (linear-count registers, Misra–Gries)
  *   whose state is CONSTANT regardless of rung — the at-scale
  *   alternative the exact tiers are priced against.
  *
  * Usage: runMain graft.operators.LmLadderBench [nDocs ...]
  */
object LmLadderBench {

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val out = work
    (out, (System.nanoTime() - t0) / 1e9)
  }

  /** Zipf-headed corpus: a single head token carries ~10% of ALL token
    * occurrences (the "the" regime English actually has — ~7% per
    * Zipf), the rest draws from a BOUNDED 100k content vocabulary (the
    * realistic Heaps tail the n/5 corpus deliberately breaks). This is
    * the corpus the skew-salt gate exists for: at 5M docs the head
    * key's probe load crosses `Skew.saltedJoinAdaptive`'s threshold and
    * the gate must CHOOSE the salted path — every fixture/ladder corpus
    * so far has read `plain`, so this rung is the first observed firing
    * of the salted join at scale.
    */
  private[graft] def zipfDocs(spark: SparkSession, nBase: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    def tok(d: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      when(pmod(xxhash64(d, j, lit(21)), lit(10)) < 1, lit("zz_the"))
        .otherwise(concat(lit("w"), pmod(xxhash64(d, j, lit(22)), lit(100000L))))
    spark.range(0, nBase)
      .select(col("id").as("doc_id"),
        transform(
          sequence(lit(0), pmod(xxhash64(col("id")), lit(91)).cast("int") + lit(9)),
          j => tok(col("id"), j)).as("toks"))
      .select(col("doc_id"), concat_ws(" ", col("toks")).as("text"),
        lit("en").as("lang"),
        concat(lit("src"), pmod(col("doc_id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")))
  }

  private def ladder(spark: SparkSession, dir: String)
      : Seq[(String, Long, () => DataFrame)] = {
    def q(name: String) = () => graft.SparkEntry.queries(name)(spark, dir)
    Seq(
      ("q162_zipf_slope", Long.MaxValue, q("q162_zipf_slope")),
      ("q128_vocab_growth", Long.MaxValue, q("q128_vocab_growth")),
      ("q117_ngram_diversity", Long.MaxValue, q("q117_ngram_diversity")),
      ("q149_good_turing", Long.MaxValue, q("q149_good_turing")),
      ("q151_kneser_ney", Long.MaxValue, q("q151_kneser_ney")),
      // the SRILM-style gtmin prune, priced against exact KN on the same
      // corpus: hapax bigram types leave the probe join's build side;
      // whether that moves the wall (vs the probe stream, which pruning
      // cannot shrink) is the measured question
      ("kn_pruned_min2", Long.MaxValue, () => CorpusOps.knPerplexityPruned(
        graft.Tables.load(spark, dir, "documents"), minCount = 2L)),
      // order-3 KN (q185/q186's kernel): the trigram type table is bigger
      // and more hapax-heavy than the bigram one, so the gtmin law should
      // AMPLIFY again — exact vs pruned priced on the same corpus
      ("kn3_exact", Long.MaxValue, () => CorpusOps.knTrigramPerplexity(
        graft.Tables.load(spark, dir, "documents"), minCount = 1L)),
      ("kn3_pruned_min2", Long.MaxValue, () => CorpusOps.knTrigramPerplexity(
        graft.Tables.load(spark, dir, "documents"), minCount = 2L)),
      ("q152_collocations", Long.MaxValue, q("q152_collocations")),
      ("q150_distinct_sketch", Long.MaxValue, q("q150_distinct_sketch")),
      ("q133_heavy_hitters", Long.MaxValue, q("q133_heavy_hitters")))
  }

  def main(args: Array[String]): Unit = {
    val zipf = args.headOption.contains("zipf")
    val sizeArgs = if (zipf) args.drop(1) else args
    val gen: (SparkSession, Long) => DataFrame =
      if (zipf) zipfDocs else DedupLadderBench.synthDocs
    val sizes = if (sizeArgs.nonEmpty) sizeArgs.map(_.toLong).toSeq
      else Seq(50000L, 500000L, 5000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // shuffle width is its own dial: reduce-side partition COUNT must
      // scale with the type-table size or partitions spill — the 5M
      // rung's superlinearity test (override independently of CPUS)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Dev convenience (the Bench.scala convention): SPARK_GRAFT_ONLY=
    // comma-separated rung-name prefixes restricts the run — a single 5M
    // exact-KN rung is ~25 min, so re-measuring one law must not re-pay
    // all nine rungs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def rungs(dir: String) = ladder(spark, dir)
      .filter(e => only.forall(_.exists(e._1.startsWith)))

    val root = java.nio.file.Files.createTempDirectory("lm_ladder").toString
    // warmup at fixture scale: codegen/JIT for every ladder entry
    locally {
      val warmDir = s"$root/warm"
      gen(spark, 5000L).write.mode("overwrite")
        .parquet(s"$warmDir/documents.parquet")
      rungs(warmDir).foreach { case (_, _, mk) =>
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
        gen(spark, n).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      }
      println(f"$n,generate,$genSecs%.1f,,")
      rungs(dir).foreach { case (name, cap, mk) =>
        if (n <= cap) {
          graft.Telemetry.drain()
          // timed: plan construction + the noop-sink materialization (the
          // Bench.scala protocol, matching AnnLadderBench). Construction is
          // NOT lazy for the LM queries — saltedJoinAdaptive runs eager
          // key-count jobs that force the cached aggregates — so mk() must
          // sit inside the window or those jobs escape the bill (the r16
          // prune rows in SCALE.md were taken under that narrower window
          // and are annotated as such). The row count runs after, untimed
          // but inside the same CacheScope so caches are reused — a timed
          // count would bill a second (partially cached) execution.
          val (rows, secs) = graft.CacheScope.run {
            val (d, s) = time {
              val d0 = mk()
              d0.write.format("noop").mode("overwrite").save()
              d0
            }
            (d.count(), s)
          }
          spark.catalog.clearCache()
          val tele = graft.Telemetry.drain()
            .filter(e => e.contains("salt") || e.contains("skew")
              || e.contains("tier") || e.contains("kn ") || e.contains("kn3 "))
            .mkString("; ").replace(",", " ")
          println(f"$n,$name,$secs%.1f,$rows,$tele")
        } else println(f"$n,$name,SKIPPED(capacity cap - see scaladoc),,")
      }
    }
    spark.stop()
  }
}
