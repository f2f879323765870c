package graft.ml

import graft.SparkSpec
import graft.model.{Coordinates, LightCurveData, Star}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.functions._

/** Column-based descriptors (position/color/property) and golden-parity of
  * CurveDescr + moment descriptors against the reference.
  */
class DescriptorsSpec extends SparkSpec {
  import spark.implicits._

  private val root: JValue = {
    val in = getClass.getResourceAsStream("/golden_kernels.json")
    try JsonMethods.parse(new java.io.InputStreamReader(in)) finally in.close()
  }

  private def num(j: JValue): Double = j match {
    case JNull       => Double.NaN
    case JDouble(d)  => d
    case JInt(i)     => i.toDouble
    case JLong(l)    => l.toDouble
    case JDecimal(d) => d.toDouble
    case other       => fail(s"unexpected $other")
  }
  private def arr(j: JValue): Array[Double] =
    j.asInstanceOf[JArray].arr.map(num).toArray
  private def approx(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) ||
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private val goldenStars: Vector[Star] =
    (root \ "comp_stars").asInstanceOf[JArray].arr.take(2).zipWithIndex.map {
      case (c, i) =>
        Star(s"g$i", None, Map.empty, Map.empty, Map.empty, None,
          Seq(LightCurveData(arr(c \ "t"), arr(c \ "m"),
            Array.fill(arr(c \ "t").length)(0.0), Map.empty)))
    }.toVector

  test("CurveDescr matches the reference's reduced-curve coordinates") {
    val df = goldenStars.toDF()
    val out = new CurveDescr(bins = 20).transform(df)
      .select(col("starId") +: (1 to 20).map(i => col(s"curve_point_$i")): _*)
      .collect().map(r => r.getString(0) -> (1 to 20).map(r.getDouble).toArray).toMap
    (root \ "curve_descr").asInstanceOf[JArray].arr.foreach { c =>
      val want = arr(c \ "out")
      val got = out(s"g${num(c \ "star").toInt}")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(approx(g, w), s"curve_point[$i]: $g != $w")
      }
    }
  }

  test("Kurtosis/Skewness descriptors match the reference") {
    val df = goldenStars.toDF()
    (root \ "moment_descr").asInstanceOf[JArray].arr.foreach { c =>
      val bins = c \ "bins" match { case JNull => None; case j => Some(num(j).toInt) }
      val sid = s"g${num(c \ "star").toInt}"
      val kd = new KurtosisDescr(bins).transform(df)
        .filter(col("starId") === sid).select("kurtosis").head().getDouble(0)
      val sd = new SkewnessDescr(bins).transform(df)
        .filter(col("starId") === sid).select("skewness").head().getDouble(0)
      assert(approx(kd, num(c \ "kurtosis")), s"kurtosis($sid, $bins): $kd")
      assert(approx(sd, num(c \ "skewness")), s"skewness($sid, $bins): $sd")
    }
  }

  test("Position, ColorIndex and Property descriptors project columns") {
    val stars = Seq(
      Star("s1", Some(Coordinates(10.0, -5.0)), Map.empty, Map.empty,
        Map("b_mag" -> "14.2", "v_mag" -> "13.1", "period" -> "2.5"),
        None, Nil),
      Star("s2", None, Map.empty, Map.empty,
        Map("b_mag" -> "15.0"), None, Nil)).toDF()
    val out = new PositionDescriptor().transform(stars)
    assert(out.filter(col("starId") === "s1").select("ra", "dec").head() ==
      org.apache.spark.sql.Row(10.0, -5.0))

    val ci = new ColorIndexDescr(Seq(("b_mag", "v_mag"))).transform(stars)
    val bv = ci.filter(col("starId") === "s1").select("v_mag-b_mag").head().getDouble(0)
    assert(approx(bv, 13.1 - 14.2))
    assert(ci.filter(col("starId") === "s2").select("v_mag-b_mag").head().isNullAt(0))

    val pd = new PropertyDescr(Seq("period")).transform(stars)
    assert(approx(pd.filter(col("starId") === "s1").select("period").head().getDouble(0), 2.5))
  }

  test("stars without light curves yield null features (NONE_VALUE)") {
    val stars = Seq(
      Star("with", None, Map.empty, Map.empty, Map.empty, None,
        Seq(LightCurveData(Array(1.0, 2, 3, 4), Array(1.0, 2, 1, 2),
          Array(0.0, 0, 0, 0), Map.empty))),
      Star("without", None, Map.empty, Map.empty, Map.empty, None, Nil)).toDF()
    val out = new AbbeValueDescr().transform(stars)
    assert(!out.filter(col("starId") === "with").select("abbe_value").head().isNullAt(0))
    assert(out.filter(col("starId") === "without").select("abbe_value").head().isNullAt(0))
  }
}
