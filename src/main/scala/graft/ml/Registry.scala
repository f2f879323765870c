package graft.ml

import graft.sources.ConfigParsers.{VBool, VFloat, VInt, VStr, Value}

/** Name → instance factories for descriptors and deciders — the explicit
  * replacement for the reference's reflection-based plugin scan
  * (`data_manager/package_reader.py:28-78`): the CLI and the tuning-file
  * parser address components by class name with snake_case params, exactly
  * the names a `Class:param` tuning header uses.
  */
object Registry {

  type Templates = Seq[(Array[Double], Array[Double])]

  private def num(v: Value): Double = v match {
    case VInt(i)   => i.toDouble
    case VFloat(d) => d
    case VStr(s)   => s.toDouble
    case VBool(b)  => if (b) 1.0 else 0.0
    case other     => throw new IllegalArgumentException(s"not numeric: $other")
  }

  private def dbl(p: Map[String, Value], k: String, d: Double): Double =
    p.get(k).map(num).getOrElse(d)
  private def int(p: Map[String, Value], k: String, d: Int): Int =
    p.get(k).map(num(_).toInt).getOrElse(d)
  private def intOpt(p: Map[String, Value], k: String): Option[Int] =
    p.get(k).map(num(_).toInt)

  /** Comparative descriptors take the template curves collected from the
    * `-t` sample; the rest ignore `templates`.
    */
  def descriptor(name: String, p: Map[String, Value],
                 templates: Templates = Nil): Descriptor = name match {
    case "AbbeValueDescr"      => new AbbeValueDescr(intOpt(p, "bins"))
    case "SkewnessDescr"       => new SkewnessDescr(intOpt(p, "bins"))
    case "KurtosisDescr"       => new KurtosisDescr(intOpt(p, "bins"))
    case "CurveDensityDescr"   => new CurveDensityDescr()
    case "VariogramSlopeDescr" => new VariogramSlopeDescr(dbl(p, "days_per_bin", 1.0))
    case "PositionDescriptor"  => new PositionDescriptor()
    case "CurveDescr" =>
      new CurveDescr(int(p, "bins", 100), intOpt(p, "height"), intOpt(p, "red_dim"))
    case "CurvesShapeDescr" =>
      new CurvesShapeDescr(templates, dbl(p, "days_per_bin", 10.0),
        int(p, "alphabet_size", 10))
    case "HistShapeDescr" =>
      new HistShapeDescr(templates, int(p, "bins", 10), int(p, "alphabet_size", 7))
    case "VariogramShapeDescr" =>
      new VariogramShapeDescr(templates, int(p, "bins", 10), int(p, "alphabet_size", 7))
    case other => throw new IllegalArgumentException(s"Unknown descriptor: $other")
  }

  def decider(name: String, p: Map[String, Value]): Decider = {
    val t = dbl(p, "threshold", 0.5)
    name match {
      case "QDADec"          => new QDADec(t)
      case "LDADec"          => new LDADec(t)
      case "GaussianNBDec"   => new GaussianNBDec(t)
      case "TreeDec"         => new TreeDec(t)
      case "RandomForestDec" => new RandomForestDec(t)
      case "ExtraTreesDec"   => new ExtraTreesDec(t)
      case "GradBoostDec"    => new GradBoostDec(t)
      case "AdaBoostDec"     => new AdaBoostDec(t)
      case "SVCDec"          => new SVCDec(t)
      case "NeuronDecider"   => new NeuronDecider(t)
      case "KMeansDecider"   => new KMeansDecider(t)
      case other => throw new IllegalArgumentException(s"Unknown decider: $other")
    }
  }
}
