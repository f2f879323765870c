package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Capacity ladder for the ANN family (dev tool, run on demand; results
  * recorded in SCALE.md): the gated corpora stop at sf0.1 (2k vectors ×
  * 64 dims), so this prices the whole serving ladder — exact, LSH, IVF,
  * SQ8, PQ, PQ+refine, IVF-PQ — at 25×/250×/2500× that size on a
  * synthetic corpus with REAL neighbor structure (cluster + noise; see
  * [[synthEmb]]), and measures recall@3 against the exact baseline at
  * every rung, so the recall/latency trade-off is a measured curve, not
  * the fixture point.
  *
  * What the ladder must prove (the counterpart of DedupLadderBench's
  * pigeonhole law): the [[Similarity.IVF_K]] scaladoc claims the list
  * count is a deployment dial "≈ √N at the target scale" while the
  * fixture pins k=16 — so serving cost at fixed k degrades as
  * nprobe/k = 25% OF THE CORPUS per probe (linear in N), while
  * `ivf_scaled` (k=⌈√N⌉, nprobe=8) scans ~8·N/k ≈ 8√N vectors
  * (sublinear). Both run the SAME production path ([[Similarity.ivfTopK]]
  * — q57 is that path at the fixture dials), so the crossover is priced
  * on the shipped code. The linear-scan tiers (SQ8/PQ) are expected to
  * stay linear in N with byte-width constants — the ladder measures
  * whether their constants hold and what recall each buys per rung.
  *
  * Generation is deterministic (xxhash64 per (vec, dim) — no RNG state),
  * entirely distributed, and writes ordinary `embeddings.parquet` dirs
  * the production queries read unmodified.
  *
  * Usage: runMain graft.operators.AnnLadderBench [nVecs ...]
  */
object AnnLadderBench {

  /** Fixture dims: 64 floats (a multiple of PQ_M=8, as pqModel requires). */
  private val Dim = 64

  /** Latent cluster count. Fixed at 256: same-cluster cosine ≈ 0.8,
    * cross-cluster ≈ 0 (centers uniform [-1,1] per dim — variance 1/3;
    * noise 0.5×uniform — variance 1/12), so every vector's true top-3
    * neighbors are same-cluster and the approximate tiers have genuine
    * structure to find — uniform hash-soup would make recall a
    * coin-flip artifact, PQ's documented worst regime, and the ladder
    * would price nothing.
    */
  private val Clusters = 256

  /** nVecs clustered vectors as an embeddings-schema frame
    * (vec_id, embedding: array<float>, label).
    */
  private[graft] def synthEmb(spark: SparkSession, n: Long): DataFrame = {
    def u(c1: Column, c2: Column, salt: Int): Column = // uniform [-1, 1]
      pmod(xxhash64(c1, c2, lit(salt)), lit(2001)).cast("double") / 1000.0 - 1.0
    spark.range(0, n)
      .withColumn("cl", pmod(xxhash64(col("id"), lit(5)), lit(Clusters)))
      .select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(Dim - 1)),
          j => (u(col("cl"), j, 11) + lit(0.5) * u(col("id"), j, 13))
            .cast("float")).as("embedding"),
        col("cl").cast("int").as("label"))
  }

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val out = work
    (out, (System.nanoTime() - t0) / 1e9)
  }

  /** (name, per-rung cap, frame builder). Gated-query entries run the
    * production paths verbatim via SparkEntry; `ivf_scaled` is the same
    * q57 chain at the √N dial the IVF_K scaladoc prescribes.
    */
  private def ladder(spark: SparkSession, dir: String)
      : Seq[(String, Long, () => DataFrame)] = {
    def q(name: String) = () => graft.SparkEntry.queries(name)(spark, dir)
    def embDf = graft.Tables.load(spark, dir, "embeddings")
    Seq(
      ("q48_exact_knn", Long.MaxValue, q("q48_cosine_knn")),
      ("q49_lsh_16x12", Long.MaxValue, q("q49_ann_lsh")),
      ("q57_ivf_k16_np4", Long.MaxValue, q("q57_ann_ivf")),
      ("ivf_scaled_sqrtN_np8", Long.MaxValue, () => {
        val n = embDf.count()
        Similarity.ivfTopK(embDf, math.ceil(math.sqrt(n.toDouble)).toInt, 8)
      }),
      ("q90_sq8_scan", Long.MaxValue, q("q90_ann_sq8")),
      ("q92_pq_adc", Long.MaxValue, q("q92_ann_pq")),
      ("q94_pq_refine50", Long.MaxValue, q("q94_pq_refine")),
      ("q95_ivfpq", Long.MaxValue, q("q95_ivfpq")))
  }

  /** exact/approx top-3 sets per probe → mean recall@3 (the Bench.scala
    * recall contract: every entry emits (p_id, c_id, rn)).
    */
  private def top3(rows: Array[org.apache.spark.sql.Row],
                   df: DataFrame): Map[Long, Set[Long]] = {
    val (ip, ic, irn) = (df.schema.fieldIndex("p_id"),
      df.schema.fieldIndex("c_id"), df.schema.fieldIndex("rn"))
    rows.filter(_.getInt(irn) <= 3).map(r => (r.getLong(ip), r.getLong(ic)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def recallVs(exact: Map[Long, Set[Long]],
                       approx: Map[Long, Set[Long]]): Double = {
    val ps = exact.keySet
    ps.toSeq.map { p =>
      (exact(p) & approx.getOrElse(p, Set.empty)).size.toDouble / exact(p).size
    }.sum / ps.size
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

    val root = java.nio.file.Files.createTempDirectory("ann_ladder").toString
    // warmup at fixture scale: codegen/JIT for every ladder entry
    locally {
      val warmDir = s"$root/warm"
      synthEmb(spark, 2000L).write.mode("overwrite")
        .parquet(s"$warmDir/embeddings.parquet")
      ladder(spark, warmDir).foreach { case (_, _, mk) =>
        graft.CacheScope.run {
          mk().write.format("noop").mode("overwrite").save()
        }
        spark.catalog.clearCache()
      }
      graft.Telemetry.drain()
      ()
    }

    println("n_vecs,query,secs,out_rows,recall_at3")
    sizes.foreach { n =>
      val dir = s"$root/n$n"
      val (_, genSecs) = time {
        synthEmb(spark, n).write.mode("overwrite")
          .parquet(s"$dir/embeddings.parquet")
      }
      println(f"$n,generate,$genSecs%.1f,,")
      var exact: Option[Map[Long, Set[Long]]] = None
      ladder(spark, dir).foreach { case (name, cap, mk) =>
        if (n <= cap) {
          // timed: the noop-sink materialization (the Bench.scala
          // protocol); the probe-sized output is then collected once,
          // untimed, for the row count and the recall sets
          val (res, secs) = graft.CacheScope.run {
            val d = mk()
            val (_, s) = time {
              d.write.format("noop").mode("overwrite").save()
            }
            val collected = d.collect()
            ((collected.length.toLong, top3(collected, d)), s)
          }
          spark.catalog.clearCache()
          val (rows, t3) = res
          if (name == "q48_exact_knn") exact = Some(t3)
          val rec = exact.filter(_ => name != "q48_exact_knn")
            .map(e => f"${recallVs(e, t3)}%.3f").getOrElse("")
          println(f"$n,$name,$secs%.1f,$rows,$rec")
        } else println(f"$n,$name,SKIPPED(capacity cap - see scaladoc),,")
      }
    }
    spark.stop()
  }
}
