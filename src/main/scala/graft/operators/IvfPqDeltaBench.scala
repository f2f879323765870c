package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capacity pricing for the incremental residual IVF-PQ maintenance
  * path (dev tool, run on demand; results recorded in SCALE.md): the
  * IvfPqDeltaSpec fixture proves CORRECTNESS at 2k vectors; this prices
  * the ECONOMICS at corpus scale — what a daily-ingest batch costs as an
  * append (frozen quantizer + frozen codebook, the two-level assignment
  * path) versus what the same batch costs by re-training the whole
  * index, and what the append's serve tax is (recall of the
  * base∪delta index vs a fresh full rebuild, both against exact KNN).
  *
  * Per rung n (base corpus size, delta = 1% of n — the daily-batch
  * shape):
  *  - `build_base`    writeIvfPqIndex at the √N/auto-m deployment dials
  *  - `append_1pct`   appendIvfPqDelta with maintenance disabled
  *  - `serve_appended` / `serve_rebuilt` probe latency + recall@3 vs
  *    exact over base∪delta
  *  - `retrain`       retrainIvfPq (the full fold the policy amortizes)
  *
  * Usage: runMain graft.operators.IvfPqDeltaBench [nVecs ...]
  */
object IvfPqDeltaBench {

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val out = work
    (out, (System.nanoTime() - t0) / 1e9)
  }

  private def top3(df: DataFrame): Map[Long, Set[Long]] = {
    val (ip, ic, irn) = (df.schema.fieldIndex("p_id"),
      df.schema.fieldIndex("c_id"), df.schema.fieldIndex("rn"))
    df.collect().filter(_.getInt(irn) <= 3)
      .map(r => (r.getLong(ip), r.getLong(ic)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def recallVs(exact: Map[Long, Set[Long]],
                       got: Map[Long, Set[Long]]): Double =
    exact.keySet.toSeq.map { p =>
      (exact(p) & got.getOrElse(p, Set.empty)).size.toDouble / exact(p).size
    }.sum / exact.size

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(500000L, 5000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the rungs price append vs retrain EXPLICITLY — auto-maintenance
    // firing inside the append row would double-bill the retrain
    spark.conf.set(Similarity.RETRAIN_FRACTION_CONF, "0")
    spark.conf.set(Similarity.RETRAIN_DRIFT_CONF, "0")

    val root = java.nio.file.Files.createTempDirectory("ivfpq_delta").toString
    // warmup at fixture scale: codegen/JIT for every step
    locally {
      val dir = s"$root/warm"
      AnnLadderBench.synthEmb(spark, 2000L).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")
      val e = graft.Tables.load(spark, dir, "embeddings")
        .select("vec_id", "embedding")
      Similarity.writeIvfPqIndex(e.filter(col("vec_id") < 1800), s"$dir/idx")
      Similarity.appendIvfPqDelta(e.filter(col("vec_id") >= 1800), s"$dir/idx")
      Similarity.ivfPqSearchAgainstIndex(e.filter(col("vec_id") < 20), s"$dir/idx")
        .write.format("noop").mode("overwrite").save()
      Similarity.retrainIvfPq(spark, s"$dir/idx")
      graft.Telemetry.drain()
      ()
    }

    println("n_vecs,step,secs,recall_at3,telemetry")
    sizes.foreach { n =>
      val dir = s"$root/n$n"
      val delta = n / 100
      val (_, genSecs) = time {
        AnnLadderBench.synthEmb(spark, n + delta).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      }
      println(f"$n,generate,$genSecs%.1f,,")
      val all = graft.Tables.load(spark, dir, "embeddings")
        .select("vec_id", "embedding")
      val baseDf = all.filter(col("vec_id") < n)
      val deltaDf = all.filter(col("vec_id") >= n)
      val probes = all.filter(col("vec_id") < 20)
      val sqrtK = math.ceil(math.sqrt(n.toDouble)).toInt

      // exact ground truth over base ∪ delta (the recall baseline)
      val (exact, exactSecs) = graft.CacheScope.run {
        time(top3(Similarity.q48CosineKnn(spark, dir)))
      }
      spark.catalog.clearCache()
      println(f"$n,exact_knn,$exactSecs%.1f,,")

      def step(name: String, recall: Option[Double] = None)(work: => Unit): Unit = {
        graft.Telemetry.drain()
        val (_, secs) = graft.CacheScope.run(time(work))
        spark.catalog.clearCache()
        val tele = graft.Telemetry.drain()
          .filter(e => e.contains("ivf") || e.contains("ivfpq"))
          .mkString("; ").replace(",", " ")
        println(f"$n,$name,$secs%.1f,${recall.fold("")(r => f"$r%.3f")},$tele")
      }

      step("build_base") {
        Similarity.writeIvfPqIndex(baseDf, s"$dir/idx", ivfK = sqrtK)
      }
      step("append_1pct") {
        Similarity.appendIvfPqDelta(deltaDf, s"$dir/idx")
        ()
      }
      def serveStep(name: String): Unit = {
        graft.Telemetry.drain()
        val (rec, secs) = graft.CacheScope.run {
          val (t3, s) = time(top3(
            Similarity.ivfPqSearchAgainstIndex(probes, s"$dir/idx", nprobe = 8)))
          (recallVs(exact, t3), s)
        }
        spark.catalog.clearCache()
        println(f"$n,$name,$secs%.1f,$rec%.3f,")
      }
      serveStep("serve_appended")
      step("retrain") {
        Similarity.retrainIvfPq(spark, s"$dir/idx")
      }
      serveStep("serve_rebuilt")
    }
    spark.stop()
  }
}
