package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q157 temperature-scaled mixture (α = 1/2): simplex and flattening
  * laws on the real fixture, exact replay on a constructed skewed
  * corpus, and the up/down-sampling direction.
  */
class TemperatureMixSpec extends SparkSpec {

  private def rows(dir: String) =
    CorpusOps.queries("q157_temperature_mix")(spark, dir)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("n_s"),
        r.getAs[Double]("p_raw"), r.getAs[Double]("weight"),
        r.getAs[Double]("sample_factor")))

  test("simplex + flattening laws (sf0.001)") {
    val out = rows("/root/testdata/sf0.001")
    assert(out.nonEmpty)
    // both weight columns are (rounded) distributions
    assert(math.abs(out.map(_._3).sum - 1.0) <= out.length * 5e-7)
    assert(math.abs(out.map(_._4).sum - 1.0) <= out.length * 5e-7)
    // flattening: the α = 1/2 weight ratio between any two sources is
    // the sqrt of their size ratio, so max/min contracts exactly
    val mx = out.maxBy(_._2)
    val mn = out.minBy(_._2)
    if (mx._2 > mn._2) {
      val sizeRatio = mx._2.toDouble / mn._2
      val wRatio = mx._4 / mn._4
      assert(wRatio < sizeRatio,
        s"temperature must flatten: $wRatio !< $sizeRatio")
      assert(math.abs(wRatio - math.sqrt(sizeRatio)) <= 0.01 * wRatio,
        s"α=1/2 signature: $wRatio vs sqrt($sizeRatio)")
    }
    // sampling direction: the largest source down-samples, smallest up
    if (mx._2 > mn._2) {
      assert(mx._5 < 1.0, s"giant must down-sample: $mx")
      assert(mn._5 > 1.0, s"tail must up-sample: $mn")
    }
  }

  test("exact replay on a constructed 100:1 skewed corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tmix").toString
    // big: 100 docs × 10 tokens; small: 1 doc × 10 tokens
    val docs = (1 to 100).map(i =>
      (i.toLong, "a b c d e f g h i j", "en", "big", 19L)) :+
      (500L, "a b c d e f g h i j", "en", "small", 19L)
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = rows(tmp).map(r => r._1 -> r).toMap
    def micro(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val smBig = micro(math.sqrt(1000.0))   // 31622777
    val smSmall = micro(math.sqrt(10.0))   //  3162278
    val z = smBig + smSmall
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out("big") == (("big", 1000L, r6(1000.0 / 1010),
      r6(smBig.toDouble / z), r6(smBig.toDouble / z / (1000.0 / 1010)))),
      s"big: ${out("big")}")
    assert(out("small") == (("small", 10L, r6(10.0 / 1010),
      r6(smSmall.toDouble / z), r6(smSmall.toDouble / z / (10.0 / 1010)))),
      s"small: ${out("small")}")
    // 100:1 in size becomes 10:1 in weight — the α = 1/2 contraction
    assert(math.abs(out("big")._4 / out("small")._4 - 10.0) < 1e-4)
  }
}
