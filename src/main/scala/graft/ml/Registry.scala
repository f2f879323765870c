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
  private def dblOpt(p: Map[String, Value], k: String): Option[Double] =
    p.get(k).map(num)
  private def bool(p: Map[String, Value], k: String, d: Boolean): Boolean =
    p.get(k).map {
      case VBool(b) => b
      case VStr(s)  => s.equalsIgnoreCase("true") || s == "1"
      case v        => num(v) != 0.0
    }.getOrElse(d)
  private def str(p: Map[String, Value], k: String, d: String): String =
    p.get(k).map { case VStr(s) => s; case v => v.toString }.getOrElse(d)

  /** Reject typo'd/unknown tuning keys loudly: a silently ignored key would
    * fan a `Class:param` tuning header out into N copies of the DEFAULTS —
    * the exact failure explicit param threading is meant to prevent.
    */
  private def validateKeys(kind: String, name: String,
                           p: Map[String, Value], known: Set[String]): Unit = {
    val unknown = p.keySet -- known
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"Unknown $kind parameter(s) for $name: ${unknown.toSeq.sorted.mkString(", ")}" +
        s" (known: ${known.toSeq.sorted.mkString(", ")})")
  }

  /** Comparative descriptors take the template curves collected from the
    * `-t` sample; the rest ignore `templates`.
    */
  private val descriptorKeys: Map[String, Set[String]] = Map(
    "AbbeValueDescr" -> Set("bins"),
    "SkewnessDescr" -> Set("bins", "absolute"),
    "KurtosisDescr" -> Set("bins", "absolute"),
    "CurveDensityDescr" -> Set.empty,
    "VariogramSlopeDescr" -> Set("days_per_bin", "absolute"),
    "PositionDescriptor" -> Set.empty,
    "CurveDescr" -> Set("bins", "height", "red_dim"),
    "CurvesShapeDescr" -> Set("days_per_bin", "alphabet_size", "slide", "meth"),
    "HistShapeDescr" -> Set("bins", "alphabet_size", "slide", "meth"),
    "VariogramShapeDescr" -> Set("bins", "alphabet_size", "slide", "meth"))

  def descriptor(name: String, p: Map[String, Value],
                 templates: Templates = Nil): Descriptor = {
    descriptorKeys.get(name).foreach(validateKeys("descriptor", name, p, _))
    name match {
      case "AbbeValueDescr" => new AbbeValueDescr(intOpt(p, "bins"))
      case "SkewnessDescr" =>
        new SkewnessDescr(intOpt(p, "bins"), bool(p, "absolute", d = false))
      case "KurtosisDescr" =>
        new KurtosisDescr(intOpt(p, "bins"), bool(p, "absolute", d = false))
      case "CurveDensityDescr" => new CurveDensityDescr()
      case "VariogramSlopeDescr" =>
        new VariogramSlopeDescr(dbl(p, "days_per_bin", 1.0),
          bool(p, "absolute", d = false))
      case "PositionDescriptor" => new PositionDescriptor()
      case "CurveDescr" =>
        new CurveDescr(int(p, "bins", 100), intOpt(p, "height"), intOpt(p, "red_dim"))
      case "CurvesShapeDescr" =>
        new CurvesShapeDescr(templates, dbl(p, "days_per_bin", 10.0),
          int(p, "alphabet_size", 10),
          dblOpt(p, "slide").orElse(Some(0.25)), str(p, "meth", "average"))
      case "HistShapeDescr" =>
        new HistShapeDescr(templates, int(p, "bins", 10), int(p, "alphabet_size", 7),
          bool(p, "slide", d = false), str(p, "meth", "average"))
      case "VariogramShapeDescr" =>
        new VariogramShapeDescr(templates, int(p, "bins", 10), int(p, "alphabet_size", 7),
          bool(p, "slide", d = false), str(p, "meth", "average"))
      case other => throw new IllegalArgumentException(s"Unknown descriptor: $other")
    }
  }

  private val deciderKeys: Map[String, Set[String]] = Map(
    "QDADec" -> Set("threshold"),
    "LDADec" -> Set("threshold"),
    "GaussianNBDec" -> Set("threshold"),
    "TreeDec" -> Set("threshold", "max_depth"),
    "RandomForestDec" -> Set("threshold", "n_estimators"),
    "ExtraTreesDec" -> Set("threshold", "n_estimators", "max_depth"),
    "GradBoostDec" -> Set("threshold", "n_estimators"),
    "AdaBoostDec" -> Set("threshold", "n_estimators", "max_depth"),
    "SVCDec" -> Set("threshold", "gamma"),
    "NeuronDecider" -> Set("threshold", "hidden_neurons", "maxEpochs", "max_epochs"),
    "KMeansDecider" -> Set("threshold", "n_clusters"))

  /** Hyperparameter names are the reference's own — sklearn-style
    * snake_case for the sklearn wrappers (`supervised_deciders.py`,
    * `k_means_decider.py`) and the one camelCase outlier `maxEpochs`
    * (`neuron_decider.py:59`; the snake_case spelling is accepted too).
    * Unknown keys raise (see [[validateKeys]]) so a reference-spelled
    * tuning header either fans out REAL model variants or fails loudly.
    */
  def decider(name: String, p: Map[String, Value]): Decider = {
    deciderKeys.get(name).foreach(validateKeys("decider", name, p, _))
    val t = dbl(p, "threshold", 0.5)
    name match {
      case "QDADec"        => new QDADec(t)
      case "LDADec"        => new LDADec(t)
      case "GaussianNBDec" => new GaussianNBDec(t)
      case "TreeDec"       => new TreeDec(t, int(p, "max_depth", 5))
      case "RandomForestDec" =>
        new RandomForestDec(t, int(p, "n_estimators", 20))
      case "ExtraTreesDec" =>
        new ExtraTreesDec(t, int(p, "n_estimators", 10), int(p, "max_depth", 5))
      case "GradBoostDec" => new GradBoostDec(t, int(p, "n_estimators", 20))
      case "AdaBoostDec" =>
        new AdaBoostDec(t, int(p, "n_estimators", 30), int(p, "max_depth", 1))
      case "SVCDec"       => new SVCDec(t, dblOpt(p, "gamma"))
      case "NeuronDecider" =>
        // reference spelling first (neuron_decider.py:59), snake_case alias
        new NeuronDecider(t, int(p, "hidden_neurons", 10),
          intOpt(p, "maxEpochs").orElse(intOpt(p, "max_epochs")).getOrElse(150))
      case "KMeansDecider" =>
        // n_clusters=3 is the reference default (k_means_decider.py:13)
        new KMeansDecider(t, int(p, "n_clusters", 3))
      case other => throw new IllegalArgumentException(s"Unknown decider: $other")
    }
  }
}
