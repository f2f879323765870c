package graft.operators

import graft.SparkSpec
import graft.functions.expressions.SignatureExprs
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The minhash permutation count k is the estimator's resolution dial:
  * std-dev √(J(1−J)/k), so 16 slots (the reference/oracle dial) resolve
  * similarity to ~±0.12 while a production near-dup pass at 64+ resolves
  * ~±0.06. These tests pin (a) the generalized pairs path reproduces the
  * (16, 4) reference dial exactly, (b) widening k measurably shrinks the
  * estimator error on known-Jaccard pairs, (c) wider-k banding still
  * catches planted duplicates end to end.
  */
class MinhashScaleSpec extends SparkSpec {
  import spark.implicits._

  private def arr(ss: Seq[String]) =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s)).toArray[Any])

  test("generalized minhash pairs at (16, 4) reproduce q46") {
    val viaGeneral = Dedup.minhashNearDupPairs(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"), 16, 4)
      .collect().map(_.toSeq).toSet
    val viaQuery = Dedup.queries("q46_minhash_lsh")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    assert(viaGeneral == viaQuery)
  }

  test("widening k shrinks the similarity-estimator error on known-Jaccard pairs") {
    // 50 set pairs with true Jaccard 24/56: |est − J| must shrink with k
    val trueJ = 24.0 / 56.0
    val errs = (0 until 50).map { p =>
      val shared = (0 until 24).map(i => s"p${p}_shared_$i")
      val a = shared ++ (0 until 16).map(i => s"p${p}_a_$i")
      val b = shared ++ (0 until 16).map(i => s"p${p}_b_$i")
      def est(k: Int): Double = SignatureExprs.sigMatch(
        SignatureExprs.minhashK(arr(a), k), SignatureExprs.minhashK(arr(b), k))
      (math.abs(est(16) - trueJ), math.abs(est(64) - trueJ))
    }
    val mae16 = errs.map(_._1).sum / errs.size
    val mae64 = errs.map(_._2).sum / errs.size
    assert(mae64 < mae16 * 0.9,
      f"expected k=64 to beat k=16 (sigma halves twice): mae16=$mae16%.4f mae64=$mae64%.4f")
  }

  test("wide-k banding still catches planted duplicates end to end") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val rnd = new scala.util.Random(11)
    val base = (0 until 100).map { i =>
      (i.toLong, (0 until 20).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val planted = (0 until 3).flatMap { j =>
      val t = (0 until 20).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      Seq((500L + 2 * j, t), (501L + 2 * j, t))
    }
    val d = (base ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(d, k = 64, bands = 16, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 3).foreach { j =>
      assert(pairs.contains((500L + 2 * j, 501L + 2 * j)), s"planted dup $j lost at k=64")
    }
  }
}
