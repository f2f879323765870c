package graft.operators

import graft.SparkSpec

/** q126 (cross-source boilerplate coverage): hand fixture pins the
  * boilerplate rule (gram in ≥ BOILER_MIN_SOURCES sources), the coverage
  * ratio, the short-doc NULL path, and the no-window plan shape.
  */
class BoilerplateCoverageSpec extends SparkSpec {

  test("hand fixture: cross-source grams flag, within-source ones don't") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("boiler").toString
    val banner = "all rights reserved worldwide" // 4 tokens, 3 sources
    val local = "only in source one here"        // crosses 1 source only
    Seq(
      (1L, s"$banner unique alpha beta gamma", "en", "s0", 0L),
      (2L, s"$banner delta epsilon zeta eta", "en", "s1", 0L),
      (3L, s"$banner theta iota kappa lambda", "en", "s2", 0L),
      (4L, s"$local mu nu xi", "en", "s0", 0L),
      (5L, "shorty doc", "en", "s3", 0L)) // < 4 tokens -> no grams
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.CacheScope.run {
      CorpusOps.q126BoilerplateCoverage(spark, tmp)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getDouble(4)),
            r.getBoolean(5))).toMap
    }
    // doc 1: 8 tokens -> 5 distinct grams; exactly 1 (the banner) is
    // boilerplate (appears in s0/s1/s2)
    assert(rows(1L) == ((5L, 1L, Some(0.2), true)))
    assert(rows(2L)._2 == 1L && rows(2L)._4)
    assert(rows(3L)._2 == 1L && rows(3L)._4)
    // doc 4's grams live in one source only -> nothing boilerplate
    assert(rows(4L) == ((5L, 0L, Some(0.0), false)))
    // doc 5 is too short for a gram: zero counts, NULL coverage, not flagged
    assert(rows(5L) == ((0L, 0L, None, false)))
  }

  test("fixture corpus is non-degenerate and coverage is n_boiler/n_grams") {
    val rows = graft.CacheScope.run {
      CorpusOps.q126BoilerplateCoverage(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
    }
    assert(rows.exists(_._4) && rows.exists(!_._4))
    rows.filter(_._1 > 0).foreach { case (n, nb, cov, fl) =>
      val expect = math.floor(nb.toDouble / n * 1e6 + 0.5) / 1e6
      assert(cov.contains(expect))
      assert(fl == (cov.get >= CorpusOps.BOILER_FLAG))
    }
  }

  test("plan: no window; wide exchanges key on gram and doc_id only") {
    val df = CorpusOps.q126BoilerplateCoverage(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "no window in the coverage plan:\n" + p)
  }
}
