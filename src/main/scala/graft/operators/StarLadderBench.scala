package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capacity ladder for the astronomy surface (dev tool, run on demand;
  * results recorded in SCALE.md): the star pipeline has only ever been
  * priced at sf0.1 (100k events / 1.5k stars) — this prices the gated
  * queries at 10× and 50× that (1M/15k, 5M/75k), so the claimed scale
  * shapes are measured, not prose:
  *
  *  - q50/q51/q71 (descriptor fan-out → closed-form train → score/mesh):
  *    ONE per-user exchange into in-row curves, then per-row kernel CPU;
  *    training collects are class-statistics-sized. Expected linear.
  *  - q53 (comparative SAX dissimilarity): 3 collected template curves
  *    broadcast against every star — the broadcast-template shape must
  *    hold (cost ∝ stars, never stars × corpus).
  *  - q137/q177 (string-length period search, 8-point and 512-point
  *    grids): one per-user exchange; the grid multiplies IN-ROW CPU
  *    only, so the 512-point sweep must scale with users at the same
  *    ~per-point rate measured at sf0.1 (~8 ms/point there).
  *
  * Events are deterministic (xxhash64 — no RNG state): ts lands on the
  * µs grid over ~180 days (the long-ns contract `Tables.load` expects),
  * and each user's value carries a genuine periodic signal (sin at a
  * user-specific period from the q137 trial range) plus hash noise, so
  * the period search does real work rather than folding white noise.
  *
  * Usage: runMain graft.operators.StarLadderBench [nEvents ...]
  */
object StarLadderBench {

  private val Queries = Seq("q50_star_features", "q51_star_classify",
    "q53_star_comparative", "q71_star_probspace", "q137_period_search",
    "q177_period_search_dense")

  /** ~sf0.1 density: 67 events per user. */
  private val EventsPerUser = 67L

  private[graft] def synthEvents(spark: SparkSession, nEvents: Long): DataFrame = {
    val nUsers = math.max(1L, nEvents / EventsPerUser)
    // the FIXTURE's per-curve time density (30-day span, ~67 points —
    // scaling means MORE USERS, not sparser curves): the 1-day variogram
    // bins the descriptors run at need ~2 points/bin; a longer span at
    // the same count NaNs the slope fit for every star
    val spanUs = 30L * 86400L * 1000000L // 30 days on the µs grid
    spark.range(0, nEvents)
      .withColumn("user_id", pmod(xxhash64(col("id"), lit(7)), lit(nUsers)))
      // user-specific true period in the trial range [0.5, 13] days
      .withColumn("p_days",
        lit(0.5) + pmod(xxhash64(col("user_id"), lit(11)), lit(1250)) / lit(100.0))
      .withColumn("t_us", pmod(xxhash64(col("id"), lit(3)), lit(spanUs)))
      .select(
        col("id").as("event_id"),
        (col("t_us") * 1000L).as("ts"), // long ns on the µs grid
        col("user_id"),
        concat(lit("type_"), pmod(xxhash64(col("id"), lit(5)), lit(5))).as("event_type"),
        (sin(col("t_us") / lit(86400e6) / col("p_days") * lit(2 * math.Pi)) * 10.0
          + pmod(xxhash64(col("id"), lit(13)), lit(2001)) / 1000.0 - 1.0).as("value"),
        lit("{}").as("props"))
  }

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val out = work
    (out, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(100000L, 1000000L, 5000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("star_ladder").toString
    // warmup at fixture scale: codegen/JIT for every entry
    locally {
      val warmDir = s"$root/warm"
      synthEvents(spark, 10000L).write.mode("overwrite")
        .parquet(s"$warmDir/events.parquet")
      Queries.foreach { q =>
        graft.CacheScope.run {
          graft.SparkEntry.queries(q)(spark, warmDir)
            .write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      graft.Telemetry.drain()
      ()
    }

    println("n_events,query,secs,out_rows,ckpt_telemetry")
    sizes.foreach { n =>
      val dir = s"$root/n$n"
      val (_, genSecs) = time {
        synthEvents(spark, n).write.mode("overwrite")
          .parquet(s"$dir/events.parquet")
      }
      println(f"$n,generate,$genSecs%.1f,,")
      Queries.foreach { q =>
        graft.Telemetry.drain()
        // timed: plan CONSTRUCTION (q51's training collects and q71's
        // eager checkpoint run here) + the noop-sink materialization
        // (the AnnLadderBench pattern); the count is untimed but inside
        // the CacheScope so caches are reused
        val (rows, secs) = graft.CacheScope.run {
          val (d, s) = time {
            val d0 = graft.SparkEntry.queries(q)(spark, dir)
            d0.write.format("noop").mode("overwrite").save()
            d0
          }
          (d.count(), s)
        }
        spark.catalog.clearCache()
        val tele = graft.Telemetry.drain().filter(_.startsWith("ckpt "))
          .mkString("; ").replace(",", " ")
        println(f"$n,$q,$secs%.1f,$rows,$tele")
      }
    }
    spark.stop()
  }
}
