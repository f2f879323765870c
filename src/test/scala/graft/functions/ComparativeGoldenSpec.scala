package graft.functions

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Comparative descriptors vs goldens from the reference's own
  * CurvesShapeDescr / HistShapeDescr / VariogramShapeDescr.
  */
class ComparativeGoldenSpec extends AnyFunSuite {

  private val root: JValue = {
    val in = getClass.getResourceAsStream("/golden_kernels.json")
    require(in != null, "golden_kernels.json missing — run tools/gen_golden.py")
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

  private val curves: Vector[(Array[Double], Array[Double])] =
    (root \ "comp_stars").asInstanceOf[JArray].arr.map { c =>
      (arr(c \ "t"), arr(c \ "m"))
    }.toVector

  private val templates = curves.drop(2)

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("CurvesShapeDescr feature matches reference") {
    (root \ "curves_shape").asInstanceOf[JArray].arr.foreach { c =>
      val (st, sm) = curves(num(c \ "star").toInt)
      val slide = c \ "slide" match {
        case JNull => None
        case j     => Some(num(j))
      }
      val meth = (c \ "meth").asInstanceOf[JString].s
      val got = Comparative.feature(st, sm, templates, meth) { (a, b, ct, cm) =>
        Comparative.curvesShapePair(a, b, ct, cm, 30.0, 10, slide)
      }
      assert(approx(got, num(c \ "out")),
        s"curves_shape star=${num(c \ "star").toInt} slide=$slide meth=$meth: $got != ${num(c \ "out")}")
    }
  }

  test("HistShapeDescr feature matches reference") {
    (root \ "hist_shape").asInstanceOf[JArray].arr.foreach { c =>
      val (st, sm) = curves(num(c \ "star").toInt)
      val meth = (c \ "meth").asInstanceOf[JString].s
      val got = Comparative.feature(st, sm, templates, meth) { (a, b, ct, cm) =>
        Comparative.histShapePair(a, b, ct, cm, 10, 10)
      }
      assert(approx(got, num(c \ "out")), s"hist_shape meth=$meth: $got != ${num(c \ "out")}")
    }
  }

  test("VariogramShapeDescr feature matches reference") {
    (root \ "vario_shape").asInstanceOf[JArray].arr.foreach { c =>
      val (st, sm) = curves(num(c \ "star").toInt)
      val meth = (c \ "meth").asInstanceOf[JString].s
      val got = Comparative.feature(st, sm, templates, meth) { (a, b, ct, cm) =>
        Comparative.varioShapePair(a, b, ct, cm, 10, 10)
      }
      assert(approx(got, num(c \ "out")), s"vario_shape meth=$meth: $got != ${num(c \ "out")}")
    }
  }
}
