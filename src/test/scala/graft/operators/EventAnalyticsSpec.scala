package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q164/q165/q166 event analytics: structural laws on the real fixture
  * plus constructed scenarios pinning the semantics (ordered-funnel
  * strictness, cohort identities, the burst threshold and its argmax).
  */
class EventAnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q164 cohort identities on the real fixture") {
    val cells = TimeSeries.queries("q164_retention_cohorts")(spark, dir)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users")).toMap
    val users = Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    // every user is active in their own first week → the offset-0
    // column partitions the user base exactly
    assert(cells.keys.forall(_._2 >= 0), "negative offset")
    assert(cells.collect { case ((_, 0L), n) => n }.sum == users)
    // retention never exceeds the cohort's size
    cells.foreach { case ((c, o), n) =>
      assert(n <= cells((c, 0L)), s"cell ($c, $o) exceeds cohort size")
    }
  }

  test("q165 funnel prefix property on the real fixture") {
    val rows = TimeSeries.queries("q165_funnel")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ts = (1 to 4).map(j => Option(r.get(r.fieldIndex(s"t$j")))
        .map(_.asInstanceOf[Long]))
      // stages form a strict chain and a prefix
      ts.sliding(2).foreach {
        case Seq(Some(a), Some(b)) => assert(b > a, s"non-increasing: $ts")
        case Seq(None, Some(_)) => fail(s"gap in the prefix: $ts")
        case _ =>
      }
      assert(r.getAs[Int]("stage_reached") == ts.count(_.isDefined))
    }
  }

  test("q167 transition laws; q168 extraction conservation (real fixture)") {
    val m = TimeSeries.queries("q167_event_transitions")(spark, dir)
      .collect().map(r => (r.getAs[String]("cur"), r.getAs[String]("nxt")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    // row-stochastic: every current state's outgoing probabilities sum
    // to 1 (rationally n_i/row_n — doubles land within ulps)
    m.keys.map(_._1).toSeq.distinct.foreach { cur =>
      val ps = m.collect { case ((c, _), (_, p)) if c == cur => p }
      assert(math.abs(ps.sum - 1.0) < 1e-9, s"$cur row sums ${ps.sum}")
    }
    // conservation: each user contributes (events − 1) pairs
    val e = Tables.load(spark, dir, "events")
    val users = e.groupBy(col("user_id")).count().collect()
    assert(m.values.map(_._1).sum == users.map(_.getLong(1) - 1).sum)
    val x = TimeSeries.queries("q168_props_extract")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_unparsed"),
          r.getAs[Long]("sum_k"))).toMap
    assert(x.values.map(_._1).sum == e.count(), "row conservation")
    // the fixture's props are all well-formed {"k": N}
    assert(x.values.forall(_._2 == 0L), s"unexpected parse failures: $x")
  }

  test("q167/q168 constructed: deterministic chain and a broken JSON row") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("evtr").toString
    val base = 1700000000000L
    // one user cycles signup→view→signup→view…; one row carries junk JSON
    val ev = (0 until 10).map(i => (i.toLong,
      new java.sql.Timestamp(base + i * 1000L), 1L,
      if (i % 2 == 0) "signup" else "view", 1.0,
      if (i == 4) "not json" else s"""{"k": $i}"""))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val m = TimeSeries.queries("q167_event_transitions")(spark, tmp)
      .collect().map(r => (r.getAs[String]("cur"), r.getAs[String]("nxt")) ->
        r.getAs[Double]("p")).toMap
    assert(m(("signup", "view")) == 1.0 && m(("view", "signup")) == 1.0,
      s"deterministic chain must have unit transitions: $m")
    assert(m.size == 2, s"phantom transitions: $m")
    // a perfectly predictable stream costs exactly 0 nats
    val lk = TimeSeries.queries("q169_sequence_likelihood")(spark, tmp)
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Double]("avg_nll")).toMap
    assert(lk(1L) == 0.0, s"deterministic chain nll: ${lk(1L)}")
    val x = TimeSeries.queries("q168_props_extract")(spark, tmp)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_unparsed"),
          r.getAs[Long]("sum_k"), r.getAs[Double]("mean_k"))).toMap
    // the junk row (i=4, signup) is COUNTED, excluded from the sum, and
    // the mean divides by parsed rows only
    assert(x("signup") == ((5L, 1L, 0L + 2 + 6 + 8, (16.0 / 4))),
      s"signup stats: ${x("signup")}")
    assert(x("view") == ((5L, 0L, 1L + 3 + 5 + 7 + 9, 25.0 / 5)),
      s"view stats: ${x("view")}")
  }

  test("q169/q170 laws: nonnegative likelihoods, shares partition each type") {
    val lk = TimeSeries.queries("q169_sequence_likelihood")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_transitions"), r.getAs[Double]("avg_nll")))
    assert(lk.nonEmpty)
    lk.foreach { case (u, (n, nll)) =>
      assert(n > 0 && nll >= 0, s"user $u: $n / $nll")
    }
    val hp = TimeSeries.queries("q170_hourly_profile")(spark, dir)
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("hour"), r.getAs[Long]("n"), r.getAs[Double]("share")))
    hp.groupBy(_._1).foreach { case (t, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, s"$t shares")
      rows.foreach(r => assert(r._2 >= 0 && r._2 < 24, s"hour ${r._2}"))
    }
    assert(hp.map(_._3).sum ==
      Tables.load(spark, dir, "events").count(), "row conservation")
  }

  test("q174 reconciles with q36's session structure (one boundary rule)") {
    val conv = TimeSeries.queries("q174_session_conversion")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_converting"),
          r.getAs[Double]("conversion_rate"))).toMap
    val sess = TimeSeries.queries("q36_sessionize")(spark, dir)
      .collect().groupBy(_.getAs[Long]("user_id")).map { case (u, g) =>
        u -> g.length.toLong
      }
    assert(conv.keySet == sess.keySet)
    conv.foreach { case (u, (n, c, rate)) =>
      assert(n == sess(u), s"user $u: q174 sees $n sessions, q36 ${sess(u)}")
      assert(c <= n && rate >= 0 && rate <= 1, s"user $u: $c/$n/$rate")
      assert(rate == c.toDouble / n, s"user $u rate")
    }
  }

  test("constructed scenarios: funnel strictness, cohorts, burst argmax") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("evan").toString
    val base = 1700000000000L
    def at(dayMin: Int) = new java.sql.Timestamp(base + dayMin * 60000L)
    // uA completes in order; uB's purchase PRECEDES its click (stage 3);
    // uC never signs up (stage 0); uD signs up only (stage 1).
    // uE: 9 quiet days (1 event) + one 30-event spike (burst).
    val ev = Seq(
      (1L, at(0), 10L, "signup"), (2L, at(1), 10L, "view"),
      (3L, at(2), 10L, "click"), (4L, at(3), 10L, "purchase"),
      (5L, at(0), 11L, "signup"), (6L, at(1), 11L, "view"),
      (7L, at(3), 11L, "click"), (8L, at(2), 11L, "purchase"),
      (9L, at(0), 12L, "view"), (10L, at(1), 12L, "purchase"),
      (11L, at(5), 13L, "signup")) ++
      (0 until 9).map(d => (100L + d, new java.sql.Timestamp(
        base + d.toLong * 86400000L), 14L, "click")) ++
      (0 until 30).map(i => (200L + i, new java.sql.Timestamp(
        base + 9L * 86400000L + i * 1000L), 14L, "click"))
    ev.map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val fun = TimeSeries.queries("q165_funnel")(spark, tmp)
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Int]("stage_reached")).toMap
    assert(fun(10L) == 4, s"complete funnel: ${fun(10L)}")
    assert(fun(11L) == 3, s"out-of-order purchase must not count: ${fun(11L)}")
    assert(fun(12L) == 0, s"no signup: ${fun(12L)}")
    assert(fun(13L) == 1, s"signup only: ${fun(13L)}")
    val burst = TimeSeries.queries("q166_burst_days")(spark, tmp)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_bursty"), r.getAs[Long]("max_day_count"),
          Option(r.get(r.fieldIndex("top_burst_day")))
            .map(_.asInstanceOf[Long]))).toMap
    // uE: λ = 39/10 = 3.9; the 30-event day is >> 3σ, quiet days are not
    val (nb, mx, top) = burst(14L)
    assert(nb == 1 && mx == 30, s"burst census: ${burst(14L)}")
    val spikeDay = (base + 9L * 86400000L) * 1000000L / 86400000000000L
    assert(top.contains(spikeDay), s"top burst day $top vs $spikeDay")
    // single-day users: D = 1 → k·D = T, strict > fails → never bursty
    assert(burst(10L)._1 == 0 && burst(10L)._3.isEmpty,
      s"single-day user flagged: ${burst(10L)}")
    val cohorts = TimeSeries.queries("q164_retention_cohorts")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users")).toMap
    // uE spans 10 days → appears at offsets 0 and 1 of its cohort
    assert(cohorts.exists { case ((_, o), _) => o >= 1 },
      s"multi-week activity must produce a nonzero offset: $cohorts")
  }

  test("epoch grids FLOOR: a pre-epoch ts lands in the earlier bucket") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("evneg").toString
    // 1 ms before the epoch (ts = -1e6 ns): floor puts it in week/day
    // -1 (a truncating `div` — the pre-r14 shape — put it in bucket 0).
    // Both engines now state the floor explicitly via pmod subtraction:
    // DuckDB's integer `//` TRUNCATES (measured on 1.0.0), so neither
    // engine's bare division operator can carry the grid.
    val ev = Seq(
      (1L, new java.sql.Timestamp(-1L), 10L, "signup"),
      (2L, new java.sql.Timestamp(604800000L), 10L, "view")) // exactly week 1
    ev.map { case (id, ts, u, t) => (id, ts, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val cohorts = TimeSeries.queries("q164_retention_cohorts")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users")).toMap
    assert(cohorts == Map((-1L, 0L) -> 1L, (-1L, 2L) -> 1L),
      s"pre-epoch event must cohort at floor week -1 (offset 1-(-1)=2): $cohorts")
    val hours = TimeSeries.queries("q170_hourly_profile")(spark, tmp)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("hour")).toMap
    // floor(-1e6 / 3.6e12) = -1, then pmod 24 = 23: the wall-clock hour
    // of 1969-12-31 23:59:59.999 UTC. The pre-r15 `%` put it at -1 —
    // outside the documented [0,24) domain (and the `%`-vs-pmod choice
    // is exactly where a trunc-div engine would silently diverge).
    assert(hours("signup") == 23L,
      s"pre-epoch hour must land in its wall-clock bucket 23: $hours")
  }
}
