package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q117 (per-source n-gram diversity audit): the oracle pins exact values;
  * this spec pins the ratio laws, a brute-force replay on a constructed
  * corpus (including the templated-source signal the metric exists for),
  * and the two-level-aggregate plan shape.
  */
class NgramDiversitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ratio laws hold on the fixture") {
    val rows = q117Rows(dir)
    assert(rows.nonEmpty)
    rows.foreach { case (s, nd, nt, ty, ttr, ng, ngd, td) =>
      assert(nd > 0 && nt > 0 && ty > 0, s"source $s has empty counts")
      assert(ty <= nt, s"source $s types $ty > tokens $nt")
      assert(ngd <= ng, s"source $s distinct trigrams $ngd > total $ng")
      assert(ttr > 0 && ttr <= 1, s"source $s ttr $ttr")
      td.foreach(t => assert(t > 0 && t <= 1, s"source $s diversity $t"))
    }
  }

  test("constructed corpus: the templated source scores low diversity; brute-force parity") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ngdiv").toString
    val docs =
      // templated: every doc repeats the same boilerplate trigrams
      (1L to 10L).map(i => (i, "click here to subscribe now today", "en", "tmpl", 33L)) ++
        // diverse: every doc contributes fresh trigrams
        (20L to 29L).map(i => (i, s"alpha$i beta$i gamma$i delta$i epsilon$i", "en", "div", 40L)) ++
        // a short-doc source with no trigrams at all
        Seq((40L, "just two", "en", "tiny", 8L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = q117Rows(tmp).map(r => r._1 -> r).toMap
    // brute-force replay of the templated source: 6 tokens/doc, 10 docs,
    // 6 types, 4 distinct trigrams of 40 total
    assert(out("tmpl") == (("tmpl", 10L, 60L, 6L, 0.1, 40L, 4L, Some(0.1))),
      s"tmpl: ${out("tmpl")}")
    // diverse source: 5 unique tokens per doc -> ttr 1.0, diversity 1.0
    assert(out("div") == (("div", 10L, 50L, 50L, 1.0, 30L, 30L, Some(1.0))),
      s"div: ${out("div")}")
    // trigram-free source: zero counts, null ratio
    assert(out("tiny") == (("tiny", 1L, 2L, 2L, 1.0, 0L, 0L, None)),
      s"tiny: ${out("tiny")}")
    assert(out("tmpl")._8.get < out("div")._8.get,
      "the templated source must score lower trigram diversity")
  }

  test("plan: two-level aggregates only — no window, no driver collect") {
    val df = TextAnalysis.q117NgramDiversity(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "no ranking window in an audit rollup:\n" + p)
    assert(p.contains("HashAggregate"), "expected partial-capable aggregates:\n" + p)
  }

  private def q117Rows(d: String) =
    TextAnalysis.q117NgramDiversity(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
}
