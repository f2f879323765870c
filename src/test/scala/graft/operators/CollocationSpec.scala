package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q152 Dunning G² collocations: plain-Scala replay of the full top-k,
  * the measured rounding margin at the driver's gate scale, and the
  * calibration signature the statistic exists for (an always-together
  * pair beats a frequency-matched independent pair).
  */
class CollocationSpec extends SparkSpec {

  private def stats(dir: String): (Map[(String, String), Long],
    Map[String, Long], Map[String, Long], Long) = {
    val c12 = Tables.load(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val toks = t.split(" ", -1)
        toks.iterator.zip(toks.iterator.drop(1)).toSeq
      }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    (c12,
      c12.groupBy(_._1._1).map { case (w, g) => w -> g.values.sum },
      c12.groupBy(_._1._2).map { case (w, g) => w -> g.values.sum },
      c12.values.sum)
  }

  private def term(k: Long, row: Long, c: Long, n: Long): Double =
    if (k > 0) k.toDouble * math.log((k * n).toDouble / (row * c).toDouble)
    else 0.0

  private def g2raw(c12: Long, c1: Long, c2: Long, n: Long): Double =
    2.0 * (term(c12, c1, c2, n) + term(c1 - c12, c1, n - c2, n) +
      term(c2 - c12, n - c1, c2, n) +
      term(n - c1 - c2 + c12, n - c1, n - c2, n))

  private def g2micro(c12: Long, c1: Long, c2: Long, n: Long): Long =
    math.floor(g2raw(c12, c1, c2, n) * 1e6 + 0.5).toLong

  test("q152 matches the plain-Scala top-50 replay (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val (c12, c1, c2, n) = stats(dir)
    val want = c12.toSeq.map { case ((w1, w2), k) =>
      (w1, w2, k, c1(w1), c2(w2), g2micro(k, c1(w1), c2(w2), n))
    }.sortBy(t => (-t._6, t._1, t._2)).take(TextAnalysis.G2_TOP)
      .zipWithIndex.map { case (t, i) => (t._1, t._2, t._3, t._4, t._5,
        t._6, i + 1) }
    val got = TextAnalysis.queries("q152_collocations")(spark, dir)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
        math.floor(r.getAs[Double]("g2") * 1e6 + 0.5).toLong,
        r.getAs[Int]("rk"))).sortBy(_._7).toSeq
    assert(got == want,
      s"diverged:\n got ${got.take(3)}\nwant ${want.take(3)}")
  }

  test("rounding margin dwarfs the per-row ln drift bound (sf0.01)") {
    val (c12, c1, c2, n) = stats("/root/testdata/sf0.01")
    // the ratio inside each ln is bit-identical across engines (exact
    // integer products < 2^53, one correctly-rounded IEEE division), so
    // the only cross-engine drift is ≤ 1 ulp of each ln RESULT, amplified
    // by its k weight: drift ≤ 2e6 · Σ k · ulp(|ln ratio|). The ratio
    // form keeps |ln ratio| tiny exactly where k is huge (the k22 cell),
    // which is why this bound stays ~10× under every observed margin —
    // the k·(ln a − ln b) form provably would not.
    val checked = c12.toSeq.map { case ((w1, w2), k) =>
      val (r1, r2) = (c1(w1), c2(w2))
      val x = g2raw(k, r1, r2, n) * 1e6
      val margin = math.abs(x - math.floor(x) - 0.5)
      val drift = 2e6 * Seq(
        (k, term(k, r1, r2, n)),
        (r1 - k, term(r1 - k, r1, n - r2, n)),
        (r2 - k, term(r2 - k, n - r1, r2, n)),
        (n - r1 - r2 + k, term(n - r1 - r2 + k, n - r1, n - r2, n)))
        .map { case (kk, t) =>
          if (kk > 0) kk * math.ulp(t / kk) else 0.0
        }.sum
      ((w1, w2), margin, drift)
    }
    checked.foreach { case (bg, margin, drift) =>
      assert(margin > math.max(1e-4, 10 * drift),
        s"$bg: margin $margin vs drift bound $drift")
    }
  }

  test("calibration: always-together beats frequency-matched independent") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("g2").toString
    // "strong tea": 4 co-occurrences, never apart. "of the": marginals
    // 16× larger but co-occurring at chance rate (4 of 16 "of" precede
    // "the"). Raw frequency ties them (c12 = 4 for both); G² must rank
    // the dependent pair far above the independent one.
    val strongTea = Seq.fill(4)("strong tea").mkString(" ")
    val ofThe = (1 to 16).map { i =>
      if (i % 4 == 0) "of the" else s"of x$i the y$i"
    }.mkString(" ")
    Seq((1L, strongTea), (2L, ofThe))
      .map { case (i, t) => (i, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.queries("q152_collocations")(spark, tmp)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        (r.getAs[Int]("rk"), r.getAs[Double]("g2"))).toMap
    val (teaRk, teaG2) = out(("strong", "tea"))
    assert(out.get(("of", "the")).forall { case (rk, g2) =>
      rk > teaRk && g2 < teaG2
    }, s"of-the must rank below strong-tea: $out")
    assert(teaRk <= 3, s"strong-tea should top the table: $teaRk")
  }
}
