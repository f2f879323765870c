package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q139 (CUSUM change-point census): the closed form equals the resetting
  * recurrence, a sustained sub-3-MAD drift alarms where the q136 pointwise
  * census stays silent (the reason sequential detection exists), and the
  * degenerate/constant laws.
  */
class CusumSpec extends SparkSpec {

  test("closed form equals the max(0, C+x) recurrence on the fixture") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val frame = graft.CacheScope.run {
      TimeSeries.cusumFrame(e,
        TimeSeries.madBoundaries(e.select(col("user_id"), col("value"))))
        .select(col("user_id"), col("ts"), col("event_id"), col("x"), col("c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
    }
    frame.groupBy(_._1).foreach { case (_, rows) =>
      var cExp = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, x, c) =>
        cExp = math.max(0L, cExp + x)
        assert(c == cExp, "window closed form diverged from the recurrence")
      }
    }
  }

  test("sustained 2-MAD drift alarms while the pointwise census is silent") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cusum").toString
    // user 1: 30 baseline points cycling 13.98/14.00/14.02, then 20 points
    // shifted to 14.04 — every deviation stays within 2 MADs of the
    // median (med 14.02, mad 0.02), so q136 flags NOTHING; the drift's
    // cumulative excess (x = +0.01/event) clears h = 5 MADs = 0.10 at the
    // 11th shifted event. user 2: constant -> x = 0 -> no alarms.
    val base = (0 until 30).map(i => (i.toLong, i.toLong * 1000000000L, 1L,
      "obs", 13.98 + (i % 3) * 0.02, ""))
    val shift = (0 until 20).map(i => (100L + i, (30L + i) * 1000000000L, 1L,
      "obs", 14.04, ""))
    val const = (0 until 10).map(i => (200L + i, i.toLong * 1000000000L, 2L,
      "obs", 7.0, ""))
    (base ++ shift ++ const)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val mad = graft.CacheScope.run {
      TimeSeries.q136RobustOutliers(spark, tmp)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    }
    assert(mad(1L) == 0L, "drift must stay under the 3-MAD pointwise flag")
    val cs = graft.CacheScope.run {
      TimeSeries.q139CusumAlerts(spark, tmp)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.toString.toLong),
            r.getDouble(4)))).toMap
    }
    val (n1, alarms1, first1, max1) = cs(1L)
    assert(n1 == 50L && alarms1 == 10L,
      s"shifted tail beyond the 11th event alarms: $cs")
    assert(first1.contains(110L), "first alarm = the 11th shifted event")
    assert(max1 == 0.2, "peak excursion = 20 * 0.01 drift")
    assert(cs(2L) == ((10L, 0L, None, 0.0)), "constant curve: C stays 0")
  }
}
