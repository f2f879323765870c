package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q160 per-user ACF: plain-Scala BigInt replay of the rational-mean
  * form, and the signal signatures (alternation → r1 ≈ −1 with r2 ≈ +1,
  * ramp → r1 near 1, constant → NULL) on constructed curves.
  */
class AcfSpec extends SparkSpec {

  private def micro(x: Double): Long =
    (math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5)).toLong

  private def replay(series: Seq[Seq[Double]]): Seq[Map[Int, Option[Double]]] =
    series.map { xs =>
      val v = xs.map(micro)
      val n = BigInt(v.length)
      val s = BigInt(v.sum)
      val c = v.map(x => n * x - s)
      val den = c.map(x => x * x).sum
      (1 to TimeSeries.ACF_LAGS).filter(_ < v.length).map { k =>
        k -> (if (den == 0) None
        else Some((c.dropRight(k), c.drop(k)).zipped.map(_ * _).sum.toDouble /
          den.toDouble))
      }.toMap
    }

  test("q160 matches the plain-Scala BigInt replay (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val perUser = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getDouble(3)))
      .groupBy(_._1).map { case (u, g) =>
        u -> g.sortBy(_._2).map(_._3).toSeq
      }
    val want = perUser.map { case (u, xs) => u -> replay(Seq(xs)).head }
    val got = TimeSeries.queries("q160_acf")(spark, dir)
      .collect().groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) =>
        u -> rs.map(r => r.getAs[Int]("lag") ->
          Option(r.get(r.fieldIndex("r"))).map(_.asInstanceOf[Double]))
          .toMap
      }
    assert(got.keySet == want.keySet)
    got.foreach { case (u, m) =>
      assert(m == want(u), s"user $u: got $m want ${want(u)}")
    }
  }

  test("signal signatures on constructed curves") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("acf").toString
    def rows(u: Long, xs: Seq[Double]) = xs.zipWithIndex.map { case (x, i) =>
      (u * 1000 + i, new java.sql.Timestamp(1700000000000L + i * 60000L),
        u, "m", x, "{}")
    }
    // u1: strict alternation; u2: linear ramp; u3: constant
    val data = rows(1L, Seq.tabulate(40)(i => if (i % 2 == 0) 1.0 else -1.0)) ++
      rows(2L, Seq.tabulate(40)(_.toDouble)) ++
      rows(3L, Seq.fill(40)(7.25))
    data.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = TimeSeries.queries("q160_acf")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("lag")) ->
        Option(r.get(r.fieldIndex("r"))).map(_.asInstanceOf[Double])).toMap
    // alternation: r1 ≈ −1, r2 ≈ +1 (period-2 memory)
    assert(out((1L, 1)).get < -0.9, s"r1 ${out((1L, 1))}")
    assert(out((1L, 2)).get > 0.9, s"r2 ${out((1L, 2))}")
    // ramp: strong positive short-lag memory
    assert(out((2L, 1)).get > 0.9, s"ramp r1 ${out((2L, 1))}")
    // constant: den = 0 → NULL at every lag, never NaN
    (1 to TimeSeries.ACF_LAGS).foreach(k =>
      assert(out((3L, k)).isEmpty, s"constant curve lag $k: ${out((3L, k))}"))
    // and the replay agrees end-to-end on the constructed curves
    val want = replay(Seq(
      Seq.tabulate(40)(i => if (i % 2 == 0) 1.0 else -1.0),
      Seq.tabulate(40)(_.toDouble), Seq.fill(40)(7.25)))
    Seq(1L, 2L, 3L).zip(want).foreach { case (u, m) =>
      m.foreach { case (k, r) =>
        assert(out((u, k)) == r, s"user $u lag $k: ${out((u, k))} vs $r")
      }
    }
  }
}
