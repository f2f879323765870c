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
    * production paths verbatim via SparkEntry and time TRAIN+SERVE in
    * one number (the inline shape); the `*_build` / `*_serve` pairs
    * split the two through the materialized-index paths — the 100 TB
    * shape is index-once / serve-many, so a scaled quantizer's N·k·d
    * training cost must be priced as amortized build, not as serve tax.
    * `*_build` rows return an empty probe frame (no recall); `*_serve`
    * rows read ONLY the stored index (corpus work per batch is zero).
    */
  private def ladder(spark: SparkSession, dir: String)
      : Seq[(String, Long, () => DataFrame)] = {
    def q(name: String) = () => graft.SparkEntry.queries(name)(spark, dir)
    def embDf = graft.Tables.load(spark, dir, "embeddings")
    def probes = embDf.filter(col("vec_id") < 20)
    // resolved ONCE at ladder construction, outside every timed thunk — a
    // def here would bill a full corpus count (plus a second Tables.load)
    // to whichever build row first dereferences it
    val sqrtK = math.ceil(math.sqrt(embDf.count().toDouble)).toInt
    def empty = spark.range(0).select(col("id").as("p_id"),
      col("id").as("c_id"), lit(0).as("rn"))
    Seq(
      ("q48_exact_knn", Long.MaxValue, q("q48_cosine_knn")),
      ("q49_lsh_16x12", Long.MaxValue, q("q49_ann_lsh")),
      ("lsh_build_16x12", Long.MaxValue, () => {
        Similarity.writeAnnIndex(embDf, s"$dir/lsh12"); empty
      }),
      ("lsh_serve_16x12", Long.MaxValue,
        () => Similarity.annAgainstIndex(probes, s"$dir/lsh12")),
      // the LSH scale dial: wider band signatures split the buckets
      // (2^16 per band), trading per-band match probability for
      // occupancy — the clustered-corpus stress case
      ("lsh_build_16x16", Long.MaxValue, () => {
        Similarity.writeAnnIndex(embDf, s"$dir/lsh16", bits = 16); empty
      }),
      ("lsh_serve_16x16", Long.MaxValue,
        () => Similarity.annAgainstIndex(probes, s"$dir/lsh16")),
      ("q57_ivf_k16_np4", Long.MaxValue, q("q57_ann_ivf")),
      ("ivf_build_k16", Long.MaxValue, () => {
        Similarity.writeIvfIndex(embDf, s"$dir/ivf16"); empty
      }),
      ("ivf_serve_k16_np4", Long.MaxValue,
        () => Similarity.ivfSearchAgainstIndex(probes, s"$dir/ivf16")),
      // √N lists: the DEFAULT path (two-level assignment above the
      // IVF_TWOLEVEL_MIN_K gate at every real rung) vs the exact
      // single-level assignment forced via conf — the A/B that prices
      // the r17 assignment fix and measures its recall cost in the same
      // artifact (the paired *_serve rows read each build's own lists)
      ("ivf_build_sqrtN", Long.MaxValue, () => {
        Similarity.writeIvfIndex(embDf, s"$dir/ivfsq", k = sqrtK); empty
      }),
      ("ivf_serve_sqrtN_np8", Long.MaxValue,
        () => Similarity.ivfSearchAgainstIndex(probes, s"$dir/ivfsq", nprobe = 8)),
      // serve-side probe-ranking A/B on the SAME index (r18: probeListsUdf
      // gates list ranking two-level above the k-gate, like assignment):
      // this rung forces the exact ranking so the pair prices the serve
      // tax and recall delta of the two-level probe path in one artifact
      ("ivf_serve_sqrtN_np8_exactprobe", Long.MaxValue, () => {
        spark.conf.set(Similarity.TWOLEVEL_MIN_K_CONF, Int.MaxValue.toString)
        try Similarity.ivfSearchAgainstIndex(probes, s"$dir/ivfsq", nprobe = 8)
        finally spark.conf.unset(Similarity.TWOLEVEL_MIN_K_CONF)
      }),
      ("ivf_build_sqrtN_exact", Long.MaxValue, () => {
        spark.conf.set(Similarity.TWOLEVEL_MIN_K_CONF, Int.MaxValue.toString)
        try Similarity.writeIvfIndex(embDf, s"$dir/ivfsqx", k = sqrtK)
        finally spark.conf.unset(Similarity.TWOLEVEL_MIN_K_CONF)
        empty
      }),
      ("ivf_serve_sqrtN_exact_np8", Long.MaxValue,
        () => Similarity.ivfSearchAgainstIndex(probes, s"$dir/ivfsqx", nprobe = 8)),
      ("q90_sq8_scan", Long.MaxValue, q("q90_ann_sq8")),
      ("q92_pq_adc", Long.MaxValue, q("q92_ann_pq")),
      ("q94_pq_refine50", Long.MaxValue, q("q94_pq_refine")),
      // the PQ code-RESOLUTION dials: the r15 ladder measured the shipped
      // m=8 × 4-bit dial collapse to 0.00 recall at occupancy (same-cluster
      // vectors quantize to identical 32-bit codes); these rungs measure
      // which resolution growth recovers it — more subspaces (m=16/32 at
      // k=16: 64/128-bit codes) vs deeper codebooks (k=256 at m=8: 64-bit
      // codes in the same 8 bytes) — on the production pqAdcTopK /
      // pqRefineTopK paths the fixture gates hash-verify at m=8×k=16
      ("pq_adc_m16", Long.MaxValue,
        () => Similarity.pqAdcTopK(embDf, 16, Similarity.PQ_K)),
      ("pq_refine50_m16", Long.MaxValue,
        () => Similarity.pqRefineTopK(embDf, 16, Similarity.PQ_K)),
      ("pq_adc_m32", Long.MaxValue,
        () => Similarity.pqAdcTopK(embDf, 32, Similarity.PQ_K)),
      ("pq_refine50_m32", Long.MaxValue,
        () => Similarity.pqRefineTopK(embDf, 32, Similarity.PQ_K)),
      ("pq_adc_m8_k256", Long.MaxValue,
        () => Similarity.pqAdcTopK(embDf, 8, 256)),
      ("pq_refine50_m8_k256", Long.MaxValue,
        () => Similarity.pqRefineTopK(embDf, 8, 256)),
      ("q95_ivfpq", Long.MaxValue, q("q95_ivfpq")),
      // the at-occupancy serving composition: √N-list IVF prune + scaled
      // 128-bit ADC rank + exact refine — what the measured PQ law says
      // a 5M+ clustered corpus must run (flat PQ saturates below target
      // recall at ~20k docs/cluster even at m=32)
      ("ivfpq_scaled_sqrtN_m32", Long.MaxValue,
        () => Similarity.ivfPqTopK(embDf, sqrtK, 8, 32, Similarity.PQ_K)),
      // the RESIDUAL forms (q181's kernel): codes spend their resolution
      // on within-list variation — the raw-domain rungs above measure
      // exactly the collapse this exists to fix
      ("ivfpq_resid_fixture_dials", Long.MaxValue,
        () => Similarity.ivfPqResidualTopK(embDf, Similarity.IVF_K,
          Similarity.NPROBE, Similarity.PQ_M, Similarity.PQ_K)),
      ("ivfpq_resid_sqrtN_m32", Long.MaxValue,
        () => Similarity.ivfPqResidualTopK(embDf, sqrtK, 8, 32, Similarity.PQ_K)))
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

    // Dev convenience (the Bench.scala convention): SPARK_GRAFT_ONLY=
    // comma-separated rung-name prefixes restricts the run. q48_exact_knn
    // is always kept when present in the ladder — it is the recall
    // baseline every other rung scores against. A selected `*_serve` rung
    // auto-includes its paired `*_build` rung (the serve reads the index
    // directory that ONLY its build writes — selecting the serve alone
    // would fail mid-run on a missing index).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def rungs(dir: String) = {
      val all = ladder(spark, dir)
      def selected(name: String) =
        name == "q48_exact_knn" || only.forall(_.exists(name.startsWith))
      val buildsNeeded = all.map(_._1).filter(n =>
        n.contains("_serve") && selected(n)).map(_.replace("_serve", "_build"))
        // a serve rung's name carries serve-only dial suffixes (e.g.
        // ivf_serve_sqrtN_np8 pairs with ivf_build_sqrtN) — pair by the
        // longest build-rung name that prefixes the rewritten serve name
        .flatMap(s => all.map(_._1).filter(b =>
          b.contains("_build") && s.startsWith(b)).sortBy(-_.length).headOption)
        .toSet
      all.filter(e => selected(e._1) || buildsNeeded(e._1))
    }

    val root = java.nio.file.Files.createTempDirectory("ann_ladder").toString
    // warmup at fixture scale: codegen/JIT for every ladder entry
    locally {
      val warmDir = s"$root/warm"
      synthEmb(spark, 2000L).write.mode("overwrite")
        .parquet(s"$warmDir/embeddings.parquet")
      rungs(warmDir).foreach { case (_, _, mk) =>
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
      rungs(dir).foreach { case (name, cap, mk) =>
        if (n <= cap) {
          // timed: plan construction (which for the index/quantizer
          // entries includes the build/training work) + the noop-sink
          // materialization (the Bench.scala protocol); the probe-sized
          // output is then collected once, untimed, for the row count
          // and the recall sets
          val (res, secs) = graft.CacheScope.run {
            val (d, s) = time {
              val d0 = mk()
              d0.write.format("noop").mode("overwrite").save()
              d0
            }
            val collected = d.collect()
            ((collected.length.toLong, top3(collected, d)), s)
          }
          spark.catalog.clearCache()
          val (rows, t3) = res
          if (name == "q48_exact_knn") exact = Some(t3)
          val rec = exact
            .filter(_ => name != "q48_exact_knn" && !name.contains("_build"))
            .map(e => f"${recallVs(e, t3)}%.3f").getOrElse("")
          println(f"$n,$name,$secs%.1f,$rows,$rec")
        } else println(f"$n,$name,SKIPPED(capacity cap - see scaladoc),,")
      }
    }
    spark.stop()
  }
}
