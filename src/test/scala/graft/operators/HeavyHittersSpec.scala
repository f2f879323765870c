package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q133 (Misra–Gries heavy hitters): exactness and
  * partitioning-independence of the final answer, the superset (no
  * false negative) property on an adversarial stream, and the threshold
  * boundary.
  */
class HeavyHittersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sketch + verify equals the plain exact aggregate") {
    val got = graft.CacheScope.run {
      TextAnalysis.q133HeavyHitters(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val d = graft.Tables.load(spark, dir, "documents")
    val n = d.count()
    val thresh = math.ceil(TextAnalysis.HH_FRAC * n).toLong
    val want = d
      .select(explode(array_distinct(split(col("text"), " "))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= thresh)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty && got == want,
      s"missing=${(want.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- want.keySet).take(3)}")
  }

  test("adversarial stream: the answer is partitioning-independent") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hh").toString
    // 100 docs: token "hot" in 90 (way over 5%), "edge" in EXACTLY the
    // ceil(0.05*100)=5 threshold docs, "under" in 4; plus per-doc unique
    // noise tokens that churn the sketch counters
    val docs = (0 until 100).map { i =>
      val toks = Seq(s"u${i}a", s"u${i}b", s"u${i}c", s"u${i}d") ++
        (if (i < 90) Seq("hot") else Nil) ++
        (if (i % 20 == 0) Seq("edge") else Nil) ++ // docs 0,20,40,60,80 = 5
        (if (i % 25 == 1) Seq("under") else Nil)   // docs 1,26,51,76 = 4
      (i.toLong, toks.mkString(" "), "en", "s0", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(7) // adversarial spread for the per-partition sketch
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.CacheScope.run {
      TextAnalysis.q133HeavyHitters(spark, tmp)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(got == Map("hot" -> 90L, "edge" -> 5L),
      s"exactly the >= threshold tokens survive: $got")
  }
}
