package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q136 (median/MAD outlier census): planted-flare fixture, the MAD = 0
  * degenerate rule, and census laws on the events fixture.
  */
class RobustOutliersSpec extends SparkSpec {

  test("planted flare flags; constant and near-constant curves behave") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mad").toString
    // user 1: flat 14.0 curve with tiny noise + one 25.0 flare
    // user 2: perfectly constant -> MAD 0, nothing flags
    // user 3: constant except one different value -> MAD 0, that one flags
    val ev = (0 until 50).map(i =>
        (i.toLong, i.toLong * 1000000000L, 1L, "obs",
          14.0 + (i % 5 - 2) * 0.01, "")) ++
      Seq((100L, 100000000000L, 1L, "obs", 25.0, "")) ++
      (0 until 10).map(i =>
        (200L + i, i.toLong * 1000000000L, 2L, "obs", 7.0, "")) ++
      ((0 until 9).map(i =>
        (300L + i, i.toLong * 1000000000L, 3L, "obs", 5.0, "")) :+
        (399L, 9000000000L, 3L, "obs", 6.0, ""))
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val rows = graft.CacheScope.run {
      TimeSeries.q136RobustOutliers(spark, tmp)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    }
    val (n1, med1, mad1, out1) = rows(1L)
    assert(n1 == 51 && med1 == 14.0 && mad1 == 0.01)
    assert(out1 >= 1L, "the flare must flag")
    assert(rows(2L) == ((10L, 7.0, 0.0, 0L)), "constant curve: nothing flags")
    assert(rows(3L) == ((10L, 5.0, 0.0, 1L)),
      "MAD 0 flags exactly the non-median value")
  }

  test("q138: serving stored boundaries reproduces inline q136 with no percentile") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("madidx").toString
    val e = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("value"))
    TimeSeries.writeOutlierIndex(e, tmp)
    val served = TimeSeries.outliersAgainstBounds(
      e, TimeSeries.loadOutlierBounds(spark, tmp))
    val inline = graft.CacheScope.run {
      TimeSeries.q136RobustOutliers(spark, dir).collect().map(_.toSeq).toSet
    }
    assert(served.collect().map(_.toSeq).toSet == inline,
      "store → serve round-trip drifted")
    val p = served.queryExecution.executedPlan.toString
    assert(!p.contains("percentile"),
      "serving must not recompute percentiles:\n" + p)
  }

  test("census laws on the events fixture") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.CacheScope.run {
      TimeSeries.q136RobustOutliers(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
          r.getLong(4)))
    }
    val total = graft.Tables.load(spark, dir, "events").count()
    assert(rows.map(_._2).sum == total, "every event in exactly one census row")
    rows.foreach { case (u, n, mad, out) =>
      assert(out >= 0 && out < n, s"user $u outliers out of range")
      assert(mad >= 0.0)
    }
    assert(rows.exists(_._4 > 0), "the fixture has outliers somewhere")
  }
}
