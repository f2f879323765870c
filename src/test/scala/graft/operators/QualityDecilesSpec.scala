package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q88 behavioral contract: deciles cover 1..10, are score-monotone, and
  * the top-20% flag matches the decile cut — properties the hash oracle
  * implies but a refactor could silently weaken on a different fixture.
  */
class QualityDecilesSpec extends SparkSpec {
  import spark.implicits._

  test("q88 deciles are monotone in score and the top-20% cut is the 9th boundary") {
    val out = TextAnalysis.queries("q88_quality_deciles")(spark, "/root/testdata/sf0.01")
      .select("score", "decile", "keep_top20")
      .as[(Double, Int, Boolean)].collect()
    assert(out.length == 500)
    assert(out.map(_._2).min >= 1 && out.map(_._2).max == 10)
    // monotone: sort by score, deciles never decrease
    val byScore = out.sortBy(_._1).map(_._2)
    assert(byScore.zip(byScore.tail).forall { case (a, b) => a <= b }, "deciles not monotone")
    // ties get the same decile
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).distinct.length == 1, "equal scores in different deciles")
    }
    // the keep flag IS the decile cut, and selects roughly the top fifth
    out.foreach { case (_, d, k) => assert(k == (d >= 9)) }
    val kept = out.count(_._3)
    assert(kept >= 50 && kept <= 150, s"top-20% cut kept $kept of 500")
  }
}
