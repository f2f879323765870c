package graft.functions

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Pins exact semantic parity of the Scala kernels against golden outputs
  * produced by the reference implementation itself
  * (tools/gen_golden.py runs `lcc/utils/data_analysis.py` + `sax.py` on a
  * deterministic input battery).
  */
class KernelGoldenSpec extends AnyFunSuite {

  private val root: JValue = {
    val in = getClass.getResourceAsStream("/golden_kernels.json")
    require(in != null, "golden_kernels.json missing — run tools/gen_golden.py")
    try JsonMethods.parse(new java.io.InputStreamReader(in)) finally in.close()
  }

  private def num(j: JValue): Double = j match {
    case JNull           => Double.NaN
    case JString("inf")  => Double.PositiveInfinity
    case JString("-inf") => Double.NegativeInfinity
    case JDouble(d)      => d
    case JInt(i)         => i.toDouble
    case JLong(l)        => l.toDouble
    case JDecimal(d)     => d.toDouble
    case other           => fail(s"unexpected number $other")
  }

  private def arr(j: JValue): Array[Double] =
    j.asInstanceOf[JArray].arr.map(num).toArray

  private def cases(name: String): List[JValue] =
    (root \ name).asInstanceOf[JArray].arr

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private def assertArr(got: Array[Double], want: Array[Double], ctx: String): Unit = {
    assert(got.length == want.length, s"$ctx: length ${got.length} != ${want.length}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(approx(g, w), s"$ctx[$i]: $g != $w")
    }
  }

  test("paa matches reference to_PAA") {
    cases("paa").foreach { c =>
      val got = Kernels.paa(arr(c \ "x"), num(c \ "bins").toInt)
      assertArr(got, arr(c \ "out"), s"paa(bins=${num(c \ "bins").toInt})")
    }
  }

  test("normalize matches reference") {
    cases("normalize").foreach { c =>
      assertArr(Kernels.normalize(arr(c \ "x")), arr(c \ "out"), "normalize")
    }
  }

  test("abbe matches reference") {
    cases("abbe").foreach { c =>
      assert(approx(Kernels.abbe(arr(c \ "x"), num(c \ "n").toInt), num(c \ "out")))
    }
  }

  test("ekviPaa matches reference to_ekvi_PAA") {
    cases("ekvi_paa").foreach { c =>
      val bins = c \ "bins" match {
        case JNull => None
        case j     => Some(num(j))
      }
      val (xa, ya) = Kernels.ekviPaa(arr(c \ "t"), arr(c \ "y"), bins)
      assertArr(xa, arr(c \ "xa"), s"ekvi_paa.x(bins=$bins)")
      assertArr(ya, arr(c \ "ya"), s"ekvi_paa.y(bins=$bins)")
    }
  }

  test("fixMissing matches reference fix_missing") {
    cases("fix_missing").foreach { c =>
      val rb = (c \ "replace_at_borders").asInstanceOf[JBool].value
      val (fx, fy) = Kernels.fixMissing(arr(c \ "x"), arr(c \ "y"), rb)
      assertArr(fx, arr(c \ "fx"), s"fix_missing.x(rb=$rb)")
      assertArr(fy, arr(c \ "fy"), s"fix_missing.y(rb=$rb)")
    }
  }

  test("variogram matches reference") {
    cases("variogram").foreach { c =>
      val (vx, vy) = Kernels.variogram(arr(c \ "t"), arr(c \ "y"), num(c \ "bins").toInt)
      assertArr(vx, arr(c \ "vx"), "variogram.x")
      assertArr(vy, arr(c \ "vy"), "variogram.y")
    }
  }

  test("histogram matches reference") {
    cases("histogram").foreach { c =>
      val (h, edges) = Kernels.histogram(arr(c \ "t"), arr(c \ "y"), num(c \ "bins_num").toInt)
      assertArr(h, arr(c \ "hist"), "histogram.counts")
      assertArr(edges, arr(c \ "edges"), "histogram.edges")
    }
  }

  test("computeBins matches reference") {
    cases("compute_bins").foreach { c =>
      assert(Kernels.computeBins(arr(c \ "t"), num(c \ "days_per_bin")) == num(c \ "out").toInt)
    }
  }

  test("variogramSlope matches reference np.polyfit slope") {
    cases("variogram_slope").foreach { c =>
      val got = Kernels.variogramSlope(arr(c \ "t"), arr(c \ "y"), num(c \ "days_per_bin"))
      assert(approx(got, num(c \ "out"), 1e-6), s"slope $got != ${num(c \ "out")}")
    }
  }

  test("curveDensity matches reference") {
    cases("curve_density").foreach { c =>
      assert(approx(Kernels.curveDensity(arr(c \ "t"), arr(c \ "y")), num(c \ "out")))
    }
  }

  test("curveAbbe matches reference getAbbe") {
    cases("curve_abbe").foreach { c =>
      val bins = c \ "bins" match {
        case JNull => None
        case j     => Some(num(j).toInt)
      }
      assert(approx(Kernels.curveAbbe(arr(c \ "t"), arr(c \ "y"), bins), num(c \ "out")))
    }
  }

  test("SAX word + scaling factor match reference") {
    cases("sax_word").foreach { c =>
      val w = Sax.toLetterRep(arr(c \ "x"), num(c \ "word_size").toInt, num(c \ "alphabet").toInt)
      val want = (c \ "word").asInstanceOf[JString].s
      assert(w.word == want, s"word ${w.word} != $want")
      assert(approx(w.scalingFactor, num(c \ "scaling")))
    }
  }

  test("MINDIST matches reference compare_strings") {
    cases("mindist").foreach { c =>
      val got = Sax.minDist((c \ "a").asInstanceOf[JString].s, (c \ "b").asInstanceOf[JString].s,
        num(c \ "alphabet").toInt, num(c \ "scaling"))
      assert(approx(got, num(c \ "out")))
    }
  }
}
