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

  test("CurveDescr red_dim: PCA width, train-time fit, NaN-row bypass") {
    // 30 synthetic curves drawn from two shape families + one LC-less star
    val rnd = new scala.util.Random(7)
    val stars = (0 until 30).map { i =>
      val t = (0 until 60).map(_.toDouble).toArray
      val shape = if (i % 2 == 0) 1.0 else -1.0
      val m = t.map(x => 14.0 + shape * math.sin(x / 6.0) + 0.05 * rnd.nextGaussian())
      Star(s"p$i", None, Map.empty, Map.empty, Map.empty, None,
        Seq(LightCurveData(t, m, Array.fill(60)(0.1), Map.empty)))
    } :+ Star("noLc", None, Map.empty, Map.empty, Map.empty, None, Nil)
    val df = stars.toDF()

    val d = new CurveDescr(bins = 20, redDim = Some(3))
    assert(d.outputCols == Seq("curve_pca_1", "curve_pca_2", "curve_pca_3"))
    // unfitted evaluation is an error (fit happens at learn time)
    intercept[IllegalStateException](d.transform(df).collect())
    d.fitReduction(df)
    val out = d.transform(df).cache()
    assert(out.columns.count(_.startsWith("curve_pca_")) == 3)
    // LC-less star bypasses the reduction as nulls
    assert(out.filter(col("starId") === "noLc").select("curve_pca_1").head().isNullAt(0))
    val rows = out.filter(col("starId") =!= "noLc")
      .select("curve_pca_1", "curve_pca_2", "curve_pca_3")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 30)
    def variance(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    // principal components capture decreasing variance, mean ≈ 0 (centered)
    val v1 = variance(rows.map(_._1).toSeq)
    val v2 = variance(rows.map(_._2).toSeq)
    val v3 = variance(rows.map(_._3).toSeq)
    assert(v1 >= v2 && v2 >= v3, s"variance order: $v1, $v2, $v3")
    assert(math.abs(rows.map(_._1).sum / rows.length) < 1e-9, "pc1 not centered")

    // invalid configuration: red_dim must be below bins
    intercept[IllegalArgumentException](new CurveDescr(bins = 3, redDim = Some(5)))

    // learn() fits the reduction on searched+others automatically
    val d2 = new CurveDescr(bins = 20, redDim = Some(2))
    val searched = stars.take(15).toDF()
    val others = stars.slice(15, 30).toDF()
    val model = new StarsFilter(Seq(d2), Seq(new GaussianNBDec())).learn(searched, others)
    assert(!d2.needsFit, "learn must fit the red_dim PCA")
    assert(model.getAllPredictions(searched).count() == 15)
  }

  test("stars without light curves yield null features (NONE_VALUE)") {
    val stars = Seq(
      Star("with", None, Map.empty, Map.empty, Map.empty, None,
        Seq(LightCurveData(Array(1.0, 2, 3, 4), Array(1.0, 2, 1, 2),
          Array(0.0, 0, 0, 0), Map.empty))),
      Star("without", None, Map.empty, Map.empty, Map.empty, None, Nil),
      // present-but-empty curve (`stars_searcher.py:74` counts it as no LC):
      // must null out, not crash the kernel on the empty array
      Star("emptyLc", None, Map.empty, Map.empty, Map.empty, None,
        Seq(LightCurveData(Array.empty, Array.empty, Array.empty, Map.empty)))).toDF()
    val out = new AbbeValueDescr().transform(stars)
    assert(!out.filter(col("starId") === "with").select("abbe_value").head().isNullAt(0))
    assert(out.filter(col("starId") === "without").select("abbe_value").head().isNullAt(0))
    assert(out.filter(col("starId") === "emptyLc").select("abbe_value").head().isNullAt(0))
  }
}
