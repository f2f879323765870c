package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q127 (hot-block drop-all scrub): pins the drop-ALL semantics against
  * q103's keep-first on the same corpus, the untouched-doc md5 identity,
  * and the threshold boundary (count = HOT_BLOCK_MIN - 1 survives).
  */
class HotBlockScrubSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("hand fixture: hot blocks vanish everywhere, near-hot ones survive") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hot").toString
    val hot = "license boilerplate repeated"  // in 3 docs = HOT_BLOCK_MIN
    val dup = "appears exactly twice only"    // in 2 docs -> below threshold
    Seq(
      (1L, hot, "en", "s0", 0L),
      (2L, hot, "en", "s1", 0L),
      (3L, hot, "en", "s2", 0L),
      (4L, dup, "en", "s0", 0L),
      (5L, dup, "en", "s1", 0L),
      (6L, "a unique document", "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.CacheScope.run {
      CorpusOps.q127HotBlockScrub(spark, tmp)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    }
    // each doc here is a single block; the hot one is removed from ALL
    // THREE docs (q103 would have kept doc 1's copy)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(rows(id) == ((1L, 1L, md5hex(""))), s"doc $id must scrub empty")
    }
    // twice-occurring block is below HOT_BLOCK_MIN: untouched both times
    assert(rows(4L) == ((1L, 0L, md5hex(dup))))
    assert(rows(5L) == ((1L, 0L, md5hex(dup))))
    assert(rows(6L) == ((1L, 0L, md5hex("a unique document"))))
    // q103 on the same corpus: keep-first retains ONE hot copy
    val q103 = graft.CacheScope.run {
      CorpusOps.q103DedupScrub(spark, tmp)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    assert(q103(1L) == 0L && q103(2L) == 1L && q103(3L) == 1L,
      "q103 must keep the first occurrence q127 drops")
  }

  test("fixture corpus: removals happen and untouched docs keep their text") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.CacheScope.run {
      CorpusOps.q127HotBlockScrub(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    }
    assert(rows.exists(_._2 > 0), "the sf0.001 corpus has hot blocks")
    val original = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_._2 == 0).foreach { case (id, _, m) =>
      assert(m == original(id), s"untouched doc $id must reassemble exactly")
    }
  }

  test("plan: no window, no corpus-wide sort") {
    val df = CorpusOps.q127HotBlockScrub(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "drop-all needs no per-hash winner:\n" + p)
  }
}
