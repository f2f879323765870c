package graft.operators

import graft.SparkSpec

/** q137 (string-length period search): a planted sinusoid is recovered
  * from irregular sampling; a constant curve ties every period and
  * resolves to the shortest; short curves are excluded.
  */
class PeriodSearchSpec extends SparkSpec {

  test("planted periods are recovered; degenerate curves behave") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("period").toString
    val dayNs = 86400e9
    // irregular-but-deterministic sampling over 40 days
    def times(seed: Int) =
      (0 until 120).map(i => i * 0.337 + 0.11 * ((i * seed) % 7))
    // user 1: P = 2.0 sinusoid; user 2: P = 5.0; user 3: constant;
    // user 4: too short to qualify (<= 10 points)
    val ev =
      times(3).zipWithIndex.map { case (t, i) =>
        (i.toLong, (t * dayNs).toLong, 1L, "obs",
          14.0 + math.sin(2 * math.Pi * t / 2.0), "") } ++
      times(5).zipWithIndex.map { case (t, i) =>
        (1000L + i, (t * dayNs).toLong, 2L, "obs",
          12.0 + math.sin(2 * math.Pi * t / 5.0), "") } ++
      times(7).zipWithIndex.map { case (t, i) =>
        (2000L + i, (t * dayNs).toLong, 3L, "obs", 9.0, "") } ++
      (0 until 5).map(i =>
        (3000L + i, (i * dayNs).toLong, 4L, "obs", 1.0 * i, ""))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = graft.CacheScope.run {
      TimeSeries.q137PeriodSearch(spark, tmp)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    }
    assert(rows.keySet == Set(1L, 2L, 3L), "short curve excluded")
    assert(rows(1L)._2 == 2.0, s"user 1 period: ${rows(1L)}")
    assert(rows(2L)._2 == 5.0, s"user 2 period: ${rows(2L)}")
    // constant curve: sl = 0 at every period, ascending-grid tie -> 0.5
    assert(rows(3L)._2 == 0.5 && rows(3L)._3 == 0.0)
    // the winning fold is dramatically smoother than an unfolded walk
    assert(rows(1L)._3 < 40.0, s"string length ${rows(1L)._3} not smooth")
  }

  test("q140: templates fold the q137 winner; sinusoid shape survives, constant flattens") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("foldtpl").toString
    val dayNs = 86400e9
    def times(seed: Int) =
      (0 until 120).map(i => i * 0.337 + 0.11 * ((i * seed) % 7))
    val ev =
      times(3).zipWithIndex.map { case (t, i) =>
        (i.toLong, (t * dayNs).toLong, 1L, "obs",
          14.0 + math.sin(2 * math.Pi * t / 2.0), "") } ++
      times(7).zipWithIndex.map { case (t, i) =>
        (2000L + i, (t * dayNs).toLong, 3L, "obs", 9.0, "") }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val tpl = graft.CacheScope.run {
      TimeSeries.q140FoldTemplate(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
    }
    // conservation: every point of a qualifying user lands in one bin
    val perUser = tpl.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perUser == Map(1L -> 120L, 3L -> 120L), s"bin counts: $perUser")
    tpl.foreach { case (_, bin, n, _) =>
      assert(bin >= 0 && bin < TimeSeries.FOLD_BINS && n >= 1) }
    // the sinusoid folded at its true period keeps its amplitude: bin
    // means span ~2 (peak-to-peak), and the extremes sit half a cycle
    // apart; the constant curve's template is flat at the constant
    val m1 = tpl.filter(_._1 == 1L).map(t => t._2 -> t._4).toMap
    assert(m1.size == TimeSeries.FOLD_BINS, "sinusoid fills all bins")
    val span = m1.values.max - m1.values.min
    assert(span > 1.5 && span <= 2.0, s"folded amplitude lost: $span")
    // extremes sit roughly half a cycle apart (sin's flat quarter-bins
    // tie in expectation, so allow ±1 bin either side of antiphase)
    val hiBin = m1.maxBy(_._2)._1; val loBin = m1.minBy(_._2)._1
    assert(math.abs(math.abs(hiBin - loBin) - TimeSeries.FOLD_BINS / 2) <= 1,
      s"extremes not antiphase: $hiBin vs $loBin")
    assert(tpl.filter(_._1 == 3L).forall(_._4 == 9.0), "constant stays flat")
  }

  test("q141: serving the stored index runs no grid search or percentile") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("phaseidx").toString
    val e = graft.Tables.load(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("value"))
    graft.CacheScope.run { TimeSeries.writePhaseIndex(e, tmp) }
    val (period, template) = TimeSeries.loadPhaseIndex(spark, tmp)
    val served = TimeSeries.phaseResidualsAgainstIndex(e, period, template)
    val rows = served.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), "n_off bounded by n_scored")
      assert(r.getDouble(3) >= 0.0)
    }
    // the serve plan must hold neither the fold search (per-user
    // collect_list + UDF) nor any percentile — build-time work only
    val p = served.queryExecution.executedPlan.toString
    assert(!p.contains("percentile") && !p.contains("collect_list"),
      "serving recomputed build-time work:\n" + p)
  }

  test("denser grids refine recovery: the 512-point ladder rung localizes a planted off-grid period") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ladder").toString
    val dayNs = 86400e9
    // planted period 2.7 d — deliberately OFF the 8-value production
    // grid, so the coarse rung can only bracket it while the dense rungs
    // must localize it to within one (log-spaced) grid step. The span is
    // kept to ~4 cycles: over many cycles a half-step grid misalignment
    // (2.6% at n=64) scrambles the true-period fold enough that the
    // luckily-aligned 2P harmonic can capture the argmin — the classic
    // string-length alias, which a production sweep counters with
    // exactly this kind of denser grid.
    val planted = 2.7
    val ev = (0 until 160).map { i =>
      val t = i * 0.0674 + 0.022 * ((i * 3) % 7)
      (i.toLong, (t * dayNs).toLong, 1L, "obs",
        14.0 + math.sin(2 * math.Pi * t / planted), "")
    }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = graft.Tables.load(spark, tmp, "events")
    def recovered(n: Int): Double = graft.CacheScope.run {
      TimeSeries.bestPeriods(e, TimeSeries.periodGrid(n))
        .collect().map(r => r.getAs[Double]("best_period")).head
    }
    // grid-step factor at n log-spaced points over [0.5, 13]
    def step(n: Int) = math.pow(13.0 / 0.5, 1.0 / (n - 1))
    val r64 = recovered(64)
    val r512 = recovered(512)
    // the coarse rung may alias to the 2P harmonic: string-length smear
    // grows with POINT COUNT, not amplitude, so a half-step-misaligned
    // true period (up to 2.6% at n=64) loses to a luckily-aligned
    // harmonic whose clean fold merely doubles the total variation.
    // Accept {P, 2P} at 64 but demand the fundamental at 512, where no
    // grid point is more than 0.33% off.
    def logDist(a: Double, b: Double) = math.abs(math.log(a / b))
    assert(Seq(planted, 2 * planted).exists(p => logDist(r64, p) <= math.log(step(64))),
      s"64-rung missed both the planted period and its 2P alias: $r64 vs $planted")
    assert(logDist(r512, planted) <= math.log(step(512)),
      s"512-rung missed the planted period: $r512 vs $planted")
    // and the production 8-grid stays self-consistent: its winner is a
    // member of its own grid (the default-argument path is unchanged)
    val r8 = graft.CacheScope.run {
      TimeSeries.bestPeriods(e).collect()
        .map(_.getAs[Double]("best_period")).head
    }
    assert(TimeSeries.TRIAL_PERIODS.contains(r8), s"8-grid winner off-grid: $r8")
  }

  test("fixture census: one row per qualifying user, stat positive") {
    val rows = graft.CacheScope.run {
      TimeSeries.q137PeriodSearch(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
          r.getDouble(3)))
    }
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, p, sl) =>
      assert(n > 10 && sl >= 0.0 &&
        TimeSeries.TRIAL_PERIODS.contains(p), s"user $u row invalid")
    }
  }
}
