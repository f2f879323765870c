package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** StreamingFunnel == batch q165 on an event-time-ordered split replay,
  * with the second half arriving after a checkpointed restart (the state
  * survives the query object).
  */
class FunnelParitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def collectFunnel(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      def t(n: String) = Option(r.get(r.fieldIndex(n))).map(_.asInstanceOf[Long])
      r.getAs[Long]("user_id") ->
        (t("t1"), t("t2"), t("t3"), t("t4"), r.getAs[Int]("stage_reached"))
    }.toMap

  test("stream == batch across a two-batch ordered replay with restart") {
    val tmp = java.nio.file.Files.createTempDirectory("funstream").toString
    val e = Tables.load(spark, dir, "events")
    // event-time split: everything before the median-ish ts first —
    // arrival respects per-user event order, the contract both the
    // stream and any sequential statistic require
    val cut = e.selectExpr("percentile(ts, 0.5)").head().getDouble(0).toLong
    e.filter(col("ts") <= cut).write.mode("append").parquet(s"$tmp/in")
    StreamingFunnel.run(spark, s"$tmp/in", e.schema,
      s"$tmp/out", s"$tmp/ckpt").awaitTermination()
    val mid = collectFunnel(StreamingFunnel.readFunnel(spark, s"$tmp/out"))
    // the half-stream is a valid funnel state in itself: prefix property
    mid.values.foreach { case (t1, t2, t3, t4, st) =>
      val ts = Seq(t1, t2, t3, t4)
      assert(st == ts.count(_.isDefined))
      ts.sliding(2).foreach {
        case Seq(None, Some(_)) => fail(s"gap in prefix: $ts")
        case Seq(Some(a), Some(b)) => assert(b > a)
        case _ =>
      }
    }
    // second half lands after a RESTART (a fresh query on the same
    // checkpoint — state must restore, not recompute)
    e.filter(col("ts") > cut).write.mode("append").parquet(s"$tmp/in")
    val q2 = StreamingFunnel.run(spark, s"$tmp/in", e.schema,
      s"$tmp/out", s"$tmp/ckpt")
    q2.awaitTermination()
    val streamed = collectFunnel(StreamingFunnel.readFunnel(spark, s"$tmp/out"))
    val batch = collectFunnel(
      graft.operators.TimeSeries.queries("q165_funnel")(spark, dir))
    assert(streamed == batch,
      s"stream diverged from batch: ${streamed.toSeq.diff(batch.toSeq).take(3)}")
    // state-size law: exactly ONE four-long row per user seen in the
    // stream — no event history, no per-key growth with replay length
    val stateRows = q2.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).lastOption.getOrElse(-1L)
    val activeUsers = e.select(col("user_id")).distinct().count()
    assert(stateRows == activeUsers,
      s"funnel state must be one row per active user: $stateRows vs $activeUsers")
  }
}
