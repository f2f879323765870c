package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q115 (C4-normalized fuzzy-exact dedup): the oracle pins exact values;
  * this spec pins the normalization law (case/punctuation variants
  * collapse; distinct content does not), the relationship to q44 (strictly
  * more recall), and the plan shape (aggregate + join, no window).
  */
class NormalizeDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("planted variants collapse to one canonical; distinct text survives") {
    val tmp = java.nio.file.Files.createTempDirectory("c4norm").toString
    val docs = Seq(
      (1L, "The cat sat on the mat.", "en", "s", 23L),
      (2L, "the cat sat on the mat", "en", "s", 22L),   // case+punct variant
      (3L, "THE CAT,  SAT -- ON THE MAT!!", "en", "s", 29L), // louder variant
      (4L, "the cat sat on the mat", "en", "s", 22L),   // exact dup of 2
      (5L, "an entirely different document", "en", "s", 30L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.q115NormalizeDedup(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    // 1..4 share the normal form "the cat sat on the mat": canonical 1,
    // 4 copies, 3 distinct raw contents (2 and 4 are byte-identical)
    Seq(1L, 2L, 3L, 4L).foreach { i =>
      assert(out(i) == ((1L, 4L, 3L, i == 1L)), s"doc $i: ${out(i)}")
    }
    assert(out(5L) == ((5L, 1L, 1L, true)), s"doc 5: ${out(5L)}")
    // q44 on the same corpus sees only the byte-identical pair — the
    // planted case/punct variants are exactly the recall q115 adds
    val exact = Dedup.q44DedupExact(spark, tmp)
      .agg(sum(col("n_copies") - 1)).head().getLong(0)
    assert(exact == 1L, s"q44 should collapse only docs 2/4, got $exact extra")
  }

  test("on the fixture: every q44 dup is a q115 dup, keep partitions the corpus") {
    val out = Dedup.q115NormalizeDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(5)))
    assert(out.nonEmpty)
    // exactly one keeper per normal-form group, and it is the min id
    out.groupBy(_._2).foreach { case (h, v) =>
      val keepers = v.filter(_._4)
      assert(keepers.size == 1, s"group $h has ${keepers.size} keepers")
      assert(keepers.head._1 == v.map(_._1).min, s"group $h keeper is not min id")
    }
    // q44-identical docs always share a normal form (normalization is a
    // function of the text)
    val q44Groups = Dedup.q44DedupExact(spark, dir)
      .filter(col("n_copies") > 1).count()
    val normOf = out.map(r => r._1 -> r._2).toMap
    // recall is monotone: q115's collapsed-dup count >= q44's
    val q115Extra = out.count(!_._4)
    val q44Extra = Dedup.q44DedupExact(spark, dir)
      .agg(sum(col("n_copies") - 1)).head().getLong(0)
    assert(q115Extra >= q44Extra,
      s"normalized dedup ($q115Extra) lost recall vs exact ($q44Extra); groups=$q44Groups, docs=${normOf.size}")
  }

  test("plan: keeper rule is an aggregate (map-side partials), never a window") {
    val df = Dedup.q115NormalizeDedup(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the q103/firstOccurrenceKeep lesson: a `row_number over (partition
    // by norm_hash)` would funnel the hottest normal form (boilerplate)
    // through one reducer with no partials — the keeper must be an
    // aggregate. (The verdict join's strategy is left to the planner: at
    // fixture scale the group table rightly broadcasts; at corpus scale
    // its size estimate forces the co-partitioned shuffle join.)
    assert(!p.contains("Window"), "keeper rule must be an aggregate, not a window:\n" + p)
    assert(p.contains("HashAggregate"), "expected partial-capable hash aggregate:\n" + p)
  }
}
