package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q129 (dup-cluster size spectrum): reconciliation laws against the
  * underlying cluster frames and the coarsening relation between the
  * exact and near modalities.
  */
class ClusterSpectrumSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("spectrum reconciles with its cluster frames and covers the corpus") {
    val rows = graft.CacheScope.run {
      Dedup.q129ClusterSpectrum(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
    }
    val total = graft.Tables.load(spark, dir, "documents").count()
    Seq("exact", "near").foreach { m =>
      val part = rows.filter(_._1 == m)
      assert(part.nonEmpty)
      part.foreach { case (_, sz, nc, nd) =>
        assert(nd == sz * nc, "n_docs = size x clusters")
      }
      assert(part.map(_._4).sum == total,
        s"$m spectrum must account for every document")
    }
    // near clustering coarsens exact: identical text => identical simhash
    // (same lang), so near can only MERGE exact groups
    def nClusters(m: String) = rows.filter(_._1 == m).map(_._3).sum
    assert(nClusters("near") <= nClusters("exact"))
    // brute-force recount from q58's frame
    val nearSpectrum = graft.CacheScope.run {
      Dedup.q58DedupClusters(spark, dir)
        .groupBy(col("cluster_id")).count()
        .groupBy(col("count")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    rows.filter(_._1 == "near").foreach { case (_, sz, nc, _) =>
      assert(nearSpectrum(sz) == nc, s"near size-$sz count drifted")
    }
    // near-dup mass exists at sf0.001 (exact dups only appear at sf0.1)
    assert(rows.exists(r => r._1 == "near" && r._2 > 1))
  }

  test("hand fixture: exact dups bucket by content, near merges them") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("spectrum").toString
    val twin = "alpha beta gamma delta epsilon"
    Seq((1L, twin, "en", "s0", 0L), (2L, twin, "en", "s1", 0L),
      (3L, "completely different words here entirely", "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = graft.CacheScope.run {
      Dedup.q129ClusterSpectrum(spark, tmp)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
    }
    assert(rows(("exact", 2L)) == ((1L, 2L)), "one exact twin pair")
    assert(rows(("exact", 1L)) == ((1L, 1L)), "one exact singleton")
    assert(rows(("near", 2L)) == ((1L, 2L)), "near sees the twins too")
  }
}
