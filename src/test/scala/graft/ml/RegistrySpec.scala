package graft.ml

import graft.sources.ConfigParsers.{VBool, VFloat, VInt, VStr, Value}
import org.scalatest.funsuite.AnyFunSuite

/** Registry must thread every documented `Class:param` tuning name into the
  * constructed instance — a grid over `RandomForestDec:n_estimators` or
  * `SkewnessDescr:absolute` has to fan out REAL variants, not N copies of
  * the defaults (`package_reader.py:28-78` + `Class:param` headers).
  */
class RegistrySpec extends AnyFunSuite {

  private def p(kv: (String, Value)*): Map[String, Value] = kv.toMap

  test("descriptor params reach the instance") {
    val sk = Registry.descriptor("SkewnessDescr",
      p("bins" -> VInt(12), "absolute" -> VBool(true)))
      .asInstanceOf[SkewnessDescr]
    assert(sk.bins.contains(12) && sk.absolute)

    val ku = Registry.descriptor("KurtosisDescr", p("absolute" -> VStr("true")))
      .asInstanceOf[KurtosisDescr]
    assert(ku.absolute && ku.bins.isEmpty)

    val vs = Registry.descriptor("VariogramSlopeDescr",
      p("days_per_bin" -> VFloat(2.5), "absolute" -> VInt(1)))
      .asInstanceOf[VariogramSlopeDescr]
    assert(vs.daysPerBin == 2.5 && vs.absolute)

    val hs = Registry.descriptor("HistShapeDescr",
      p("bins" -> VInt(8), "alphabet_size" -> VInt(5),
        "slide" -> VBool(true), "meth" -> VStr("closest")))
      .asInstanceOf[HistShapeDescr]
    assert(hs.bins == 8 && hs.alphabetSize == 5 && hs.slide && hs.meth == "closest")

    val cs = Registry.descriptor("CurvesShapeDescr",
      p("days_per_bin" -> VFloat(3.0), "alphabet_size" -> VInt(12),
        "slide" -> VFloat(0.5)))
      .asInstanceOf[CurvesShapeDescr]
    assert(cs.daysPerBin == 3.0 && cs.alphabetSize == 12 && cs.slide.contains(0.5))
  }

  test("decider hyperparams reach the instance") {
    assert(Registry.decider("TreeDec", p("max_depth" -> VInt(3)))
      .asInstanceOf[TreeDec].maxDepth == 3)
    assert(Registry.decider("RandomForestDec", p("n_estimators" -> VInt(7)))
      .asInstanceOf[RandomForestDec].numTrees == 7)
    val et = Registry.decider("ExtraTreesDec",
      p("n_estimators" -> VInt(4), "max_depth" -> VInt(2)))
      .asInstanceOf[ExtraTreesDec]
    assert(et.numTrees == 4 && et.maxDepth == 2)
    assert(Registry.decider("GradBoostDec", p("n_estimators" -> VInt(5)))
      .asInstanceOf[GradBoostDec].maxIter == 5)
    val ab = Registry.decider("AdaBoostDec",
      p("n_estimators" -> VInt(9), "max_depth" -> VInt(2)))
      .asInstanceOf[AdaBoostDec]
    assert(ab.nEstimators == 9 && ab.maxDepth == 2)
    assert(Registry.decider("SVCDec", p("gamma" -> VFloat(0.3)))
      .asInstanceOf[SVCDec].gamma.contains(0.3))
    val nd = Registry.decider("NeuronDecider",
      p("hidden_neurons" -> VInt(6), "max_epochs" -> VInt(40)))
      .asInstanceOf[NeuronDecider]
    assert(nd.hidden == 6 && nd.maxIter == 40)
    assert(Registry.decider("KMeansDecider", p("n_clusters" -> VInt(3)))
      .asInstanceOf[KMeansDecider].k == 3)
    // threshold still threads everywhere
    assert(Registry.decider("QDADec", p("threshold" -> VFloat(0.7))).threshold == 0.7)
  }

  test("reference spellings and defaults: maxEpochs camelCase, n_clusters=3") {
    // neuron_decider.py:59 spells it maxEpochs — the reference-spelled
    // tuning header must reach the instance, not fall back to the default
    assert(Registry.decider("NeuronDecider", p("maxEpochs" -> VInt(77)))
      .asInstanceOf[NeuronDecider].maxIter == 77)
    // k_means_decider.py:13 defaults n_clusters=3
    assert(Registry.decider("KMeansDecider", p())
      .asInstanceOf[KMeansDecider].k == 3)
  }

  test("unknown tuning keys raise instead of silently fanning out defaults") {
    val e = intercept[IllegalArgumentException] {
      Registry.decider("NeuronDecider", p("max_epoches" -> VInt(40)))
    }
    assert(e.getMessage.contains("max_epoches"))
    val e2 = intercept[IllegalArgumentException] {
      Registry.descriptor("SkewnessDescr", p("bin" -> VInt(5)))
    }
    assert(e2.getMessage.contains("bin"))
  }
}
