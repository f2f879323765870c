package graft.operators

import graft.SparkSpec

/** q125 (tokenizer fertility): hand-computed fixture + the shared-kernel
  * contract with q40's BPE-proxy segmentation.
  */
class TokenizerFertilitySpec extends SparkSpec {

  test("hand fixture: fertility and compression are exact ratios of sums") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("fert").toString
    // "ab cd" -> 2 words, 2 subword runs, 5 chars
    // "a1b 2"  -> 2 words, 4 subword runs (a / 1 / b / 2), 5 chars
    // "x!"     -> 1 word, 2 subword runs (x / !), 2 chars
    Seq((1L, "ab cd", "en", "s0", 5L),
      (2L, "a1b 2", "en", "s0", 5L),
      (3L, "x!", "de", "s1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.q125TokenizerFertility(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7))).toMap
    assert(rows(("en", "s0")) == ((2L, 4L, 6L, 10L, 1.5, 1.666667)))
    assert(rows(("de", "s1")) == ((1L, 1L, 2L, 2L, 2.0, 1.0)))
  }

  test("subword kernel is q40's n_bpe_tokens (shared regex)") {
    val dir = "/root/testdata/sf0.001"
    val q40 = TextAnalysis.q40TokenCount(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(2).toLong, r.getInt(3))).toMap
    // per-(lang,source) sums of q40's per-doc counts equal q125's sums
    val perDoc = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = perDoc.groupBy(r => (r._2, r._3)).map { case (k, v) =>
      k -> v.map(r => q40(r._1)._1).sum
    }
    val got = TextAnalysis.q125TokenizerFertility(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    expected.foreach { case (k, w) =>
      assert(got(k) == w, s"group $k word sum drifted from q40's kernel")
    }
  }
}
