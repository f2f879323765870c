package graft.operators

import org.apache.spark.sql.SparkSession

/** Prices the cluster-durability tax (dev tool, run on demand; results
  * recorded in SCALE.md): every barrier query that cuts lineage at
  * [[graft.GraftCheckpoint.stage]] runs under BOTH durability modes —
  * `local` (executor-block localCheckpoint, the bench default) and
  * `reliable` (`Dataset.checkpoint` into a checkpoint dir, what a real
  * cluster flips on so a lost executor can't kill the composed job) —
  * and the per-barrier `ckpt` telemetry (wall/run/cpu from engine task
  * metrics) is printed next to the wall clock, so the flag's cost is a
  * measured number per barrier, not a prose claim.
  *
  * GraftCheckpointSpec proves the flip is result-identical; this prices
  * it. On this box reliable mode writes to local disk — a cluster pays
  * that plus replication/network, so the number here is the FLOOR of
  * the real tax, honest for the serialization+write component.
  *
  * Usage: runMain graft.operators.CheckpointModeBench [sfDir]
  */
object CheckpointModeBench {

  private val Queries = Seq("q104_corpus_build", "q155_pair_rank",
    "q71_star_probspace")

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val out = work
    (out, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.filterNot(_ == "reverse")
      .getOrElse("/root/testdata/sf0.1")
    // "reverse" flips mode order — run BOTH orders to bracket the
    // JIT/page-cache advantage the second mode inherits
    val modes = if (args.contains("reverse")) Seq("reliable", "local")
      else Seq("local", "reliable")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("mode,query,secs,out_rows,ckpt_telemetry")
    // mode-major order with a warmup pass per mode: JIT/codegen and the
    // parquet footer cache warm once per mode, so the local-vs-reliable
    // delta is the durability work, not first-run noise
    for (mode <- modes; pass <- Seq("warm", "timed")) {
      spark.conf.set(graft.GraftCheckpoint.ModeKey, mode)
      Queries.foreach { q =>
        graft.Telemetry.drain()
        val (rows, secs) = time {
          graft.CacheScope.run {
            val d = graft.SparkEntry.queries(q)(spark, dir)
            d.write.format("noop").mode("overwrite").save()
            d.count()
          }
        }
        spark.catalog.clearCache()
        val tele = graft.Telemetry.drain().filter(_.startsWith("ckpt "))
          .mkString("; ").replace(",", " ")
        if (pass == "timed") println(f"$mode,$q,$secs%.2f,$rows,$tele")
      }
    }
    spark.conf.set(graft.GraftCheckpoint.ModeKey, "local")
    spark.stop()
  }
}
