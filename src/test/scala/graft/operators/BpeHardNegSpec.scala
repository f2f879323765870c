package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q111 BPE merge candidates and q112 hard-negative mining: the oracles
  * pin exact values; this spec pins the BPE weighting law on a
  * constructed vocabulary and the mining laws (negatives never share the
  * probe's cluster; the exclusion actually binds vs plain kNN).
  */
class BpeHardNegSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q111: pair counts weight by word frequency and in-word multiplicity") {
    val tmp = java.nio.file.Files.createTempDirectory("bpe").toString
    // corpus: "aaa" x3 (pair aa twice per occurrence), "ab" x1, "a" (too
    // short, ignored)
    Seq((1L, "aaa aaa a", "en", "s", 9L), (2L, "aaa ab", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.q111BpeMerges(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("aa" -> 6L, "ab" -> 1L),
      s"expected aa=2 pairs x 3 occurrences, ab=1; got $out")
  }

  test("q111 on the fixture: top pair dominates and the plan is a TakeOrdered") {
    val df = TextAnalysis.q111BpeMerges(spark, sf)
    val rows = df.collect()
    assert(rows.length == 20)
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)), "not sorted by merge_count desc")
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "global top-k must plan as TakeOrderedAndProject, not a full sort")
  }

  test("q112: negatives never share the probe's cluster; exclusion binds vs plain kNN") {
    graft.CacheScope.run {
      val negs = Similarity.q112HardNegatives(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      assert(negs.nonEmpty)
      val cluster = Similarity.queries("q72_kmeans_assign")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      negs.foreach { case (p, c, _) =>
        assert(cluster(p) != cluster(c),
          s"hard negative $c shares cluster ${cluster(p)} with probe $p")
      }
      // every probe yields a full top-5 and ranks are 1..5
      negs.groupBy(_._1).foreach { case (p, g) =>
        assert(g.map(_._3).sorted.sameElements(1 to 5), s"probe $p ranks: ${g.map(_._3).toSeq}")
      }
      // the cluster exclusion must CHANGE the answer for at least one
      // probe (else the miner is just q48 and the test is vacuous)
      val knn = Similarity.q48CosineKnn(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(negs.exists { case (p, c, _) => !knn.contains((p, c)) },
        "hard-negative sets identical to plain kNN — exclusion never bound")
    }
  }
}
