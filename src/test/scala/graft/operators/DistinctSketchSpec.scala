package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q150 linear-counting distinct sketch: plain-Scala replay of the md5
  * bucket map (the sketch must be REPRODUCIBLE outside Spark — that is
  * its whole reason to exist over approx_count_distinct), the standard
  * load-range accuracy bound, and the DsirUnimaxSpec-style rounding
  * margin at the driver's sf0.01 gate scale.
  */
class DistinctSketchSpec extends SparkSpec {

  private val m = TextAnalysis.LC_M

  private def md5Bucket(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % m
  }

  private def replay(dir: String): Map[String, (Long, Long)] =
    Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ", -1)
        toks.sliding(3).withFilter(_.length == 3)
          .map(w => (r.getString(0), w.mkString(" ")))
      }
      .distinct.groupBy(_._1).map { case (src, tris) =>
        src -> (tris.length.toLong,
          tris.map(t => md5Bucket(t._2)).distinct.length.toLong)
      }

  test("q150 exact/occupied match the plain-Scala md5 replay (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val got = TextAnalysis.queries("q150_distinct_sketch")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("exact_distinct"), r.getAs[Long]("occupied"))).toMap
    assert(got == replay(dir),
      s"sketch diverged from replay: got ${got.toSeq.sortBy(_._1).take(3)}")
  }

  test("estimate accuracy and rounding margin at the sf0.01 gate scale") {
    val rows = TextAnalysis.queries("q150_distinct_sketch")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val occ = r.getAs[Long]("occupied").toDouble
      val est = r.getAs[Double]("est_distinct")
      // load factor must sit in linear counting's accurate range —
      // the fixture is sized so the sketch is a fair demonstration,
      // not a saturated bitmap
      assert(occ < 0.75 * m, s"${r.getString(0)}: sketch near-saturated")
      // standard LC error at these loads is well under 2%
      assert(math.abs(est - exact) <= 0.02 * exact + 3.0,
        s"${r.getString(0)}: est $est vs exact $exact")
      // margin: min distance of est*1e6 (pre-round value) from the
      // nearest half-integer must dwarf the ~1e-5 an ulp of the
      // engine's ln can move it at this magnitude (est ~ 1e4 → the
      // scaled value ~ 1e10, rel 1e-16 → abs ~ 1e-6)
      val y = -m.toDouble * math.log((m - occ) / m) * 1e6
      val margin = math.abs(y - math.floor(y) - 0.5)
      assert(margin > 1e-3,
        s"${r.getString(0)}: est*1e6 sits $margin from a rounding boundary")
    }
  }
}
