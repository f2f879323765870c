package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** Streaming sessionizer (flatMapGroupsWithState + event-time timeout)
  * vs batch q36: closed sessions must match the batch result exactly
  * once a watermark-advancing sentinel proves every session closed; a
  * session spanning a query RESTART must survive through checkpointed
  * state.
  */
class SessionizeParitySpec extends SparkSpec {
  import spark.implicits._

  private def readOut(path: String) =
    spark.read.option("recursiveFileLookup", "true").parquet(path)

  test("stream == batch q36 on the fixture once the watermark closes all") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables.load(spark, dir, "events")
      .select("user_id", "event_id", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("sess").toString
    val maxTs = batchEvents.agg(max(col("ts"))).collect()(0).getLong(0)
    // sentinel far past every session's last+gap: advances the global
    // watermark so every real session times out and emits
    val sentinel = Seq((-1L, -1L, maxTs + 100L * TimeSeries.SESSION_GAP_NS))
      .toDF("user_id", "event_id", "ts")
    batchEvents.unionByName(sentinel).write.parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
    val q = StreamingSessionize.run(stream, s"$tmp/out", s"$tmp/ckpt")
    q.awaitTermination()
    // state-size law: the event-time timeout REMOVES closed state — after
    // the sentinel's watermark closes every real session, only the
    // sentinel's own still-open session remains. State tracks the
    // concurrently-active population, not history.
    val stateRows = q.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).lastOption.getOrElse(-1L)
    assert(stateRows == 1L,
      s"timed-out sessions must leave the store (expected only the sentinel): $stateRows")
    val got = readOut(s"$tmp/out").filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = TimeSeries.q36Sessionize(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(want.nonEmpty && got == want,
      s"stream/batch drift: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
  }

  test("a session spanning a restart survives via checkpointed state") {
    val tmp = java.nio.file.Files.createTempDirectory("sessrestart").toString
    val hour = 3600L * 1000000000L
    def write(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("user_id", "event_id", "ts")
        .write.mode("append").parquet(s"$tmp/in")
    def stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/in").schema).parquet(s"$tmp/in")
    // run 1: three events 10 min apart — one open session, nothing emits
    write(Seq((1L, 1L, hour), (1L, 2L, hour + 600L * 1000000000L),
      (1L, 3L, hour + 1200L * 1000000000L)))
    StreamingSessionize.run(stream, s"$tmp/out", s"$tmp/ckpt").awaitTermination()
    assert(!new java.io.File(s"$tmp/out").exists() ||
      readOut(s"$tmp/out").filter(col("user_id") >= 0).count() == 0,
      "open session must not emit")
    // run 2: an event 20 min after the last CONTINUES the session across
    // the restart; the sentinel then closes it via timeout
    write(Seq((1L, 4L, hour + 2400L * 1000000000L),
      (-1L, -1L, hour + 1000L * TimeSeries.SESSION_GAP_NS)))
    StreamingSessionize.run(stream, s"$tmp/out", s"$tmp/ckpt").awaitTermination()
    val got = readOut(s"$tmp/out").filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 1L, 4L, 2400.0)),
      s"expected ONE 4-event 2400 s session, got ${got.toSeq}")
  }
}
