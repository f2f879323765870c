package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests mirroring the reference's own kernel properties
  * (`test/utils/test_data_analysis.py:6-94`): output lengths, NaN-freedom
  * after repair, approximate mean preservation, normalize contract.
  * Raw ScalaCheck (no scalatest bridge in the offline dependency set).
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val series: Gen[Array[Double]] = for {
    n <- Gen.choose(5, 300)
    xs <- Gen.listOfN(n, Gen.choose(-100.0, 100.0))
  } yield xs.toArray

  private val timedSeries: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.choose(5, 300)
    ts <- Gen.listOfN(n, Gen.choose(0.0, 1000.0))
    ys <- Gen.listOfN(n, Gen.choose(5.0, 25.0))
  } yield (ts.sorted.distinct.toArray, ys.take(ts.sorted.distinct.length).toArray)

  test("paa output length equals bins when n >= bins") {
    check(Prop.forAll(series, Gen.choose(1, 5)) { (x, b) =>
      x.length < b || Kernels.paa(x, b).length == b
    })
  }

  test("ekviPaa: length == bins, NaN-free after repair, mean in range") {
    check(Prop.forAll(timedSeries, Gen.choose(2, 50)) { case ((t, y), bins) =>
      if (t.length < bins || t.length != y.length || t.length < 2) true
      else {
        val (xa, ya) = Kernels.ekviPaa(t, y, Some(bins.toDouble))
        val m1 = ya.sum / ya.length
        xa.length == bins && ya.length == bins &&
          ya.forall(!_.isNaN) &&
          m1 >= y.min - 1e-9 && m1 <= y.max + 1e-9
      }
    })
  }

  test("normalize: zero mean, unit std (or all zeros for constant input)") {
    check(Prop.forAll(series) { x =>
      val n = Kernels.normalize(x)
      val mean = n.sum / n.length
      if (n.forall(_ == 0.0)) true
      else {
        val std = math.sqrt(n.map(v => (v - mean) * (v - mean)).sum / n.length)
        math.abs(mean) < 1e-9 && math.abs(std - 1.0) < 1e-9
      }
    })
  }

  test("computeBins respects the minimum") {
    check(Prop.forAll(timedSeries, Gen.choose(1.0, 500.0)) { case ((t, _), dpb) =>
      t.isEmpty || Kernels.computeBins(t, dpb) >= 5
    })
  }

  test("SAX words have PAA length letters within the alphabet") {
    check(Prop.forAll(series, Gen.choose(2, 16), Gen.choose(3, 20)) { (x, ws, alpha) =>
      if (x.length < ws) true
      else {
        val w = Kernels.paa(Kernels.normalize(x), ws)
        val word = Sax.alphabetize(w, alpha)
        word.length == w.length &&
          word.forall(c => c >= 'a' && c < ('a' + alpha).toChar)
      }
    })
  }

  test("MINDIST is symmetric, self-distance zero, scales linearly") {
    val letters = Gen.choose(3, 20).flatMap { alpha =>
      Gen.choose(2, 12).flatMap { len =>
        Gen.listOfN(len, Gen.choose(0, alpha - 1)).flatMap { as =>
          Gen.listOfN(len, Gen.choose(0, alpha - 1)).map { bs =>
            (alpha, as.map(i => ('a' + i).toChar).mkString,
              bs.map(i => ('a' + i).toChar).mkString)
          }
        }
      }
    }
    check(Prop.forAll(letters) { case (alpha, a, b) =>
      val ab = Sax.minDist(a, b, alpha, 1.0)
      Sax.minDist(b, a, alpha, 1.0) == ab &&
        Sax.minDist(a, a, alpha, 1.0) == 0.0 &&
        math.abs(Sax.minDist(a, b, alpha, 2.5) - 2.5 * ab) < 1e-9
    })
  }
}
