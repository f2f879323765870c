package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Regenerating a fixture dir IN PLACE must invalidate every materialized
  * index derived from it — the serving path may rebuild, never silently
  * serve results computed from the replaced corpus. The mechanism under
  * test is the index-path keying on `Tables.tableFingerprint(dir, table)`
  * (Hadoop-FS file/length/mtime fold): new fixture content ⇒ new
  * fingerprint ⇒ new index path ⇒ loud rebuild. (The complementary
  * streaming contract — a rebuild under a RUNNING query fails its next
  * batch — is IndexContractSpec's.)
  */
class FixtureRegenSpec extends SparkSpec {

  test("regenerated embeddings fixture forces an ANN index rebuild, not stale serving") {
    val dir = java.nio.file.Files.createTempDirectory("fixtureregen").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    def indexPath: String =
      graft.Tables.derivedIndexPath("graft_ann_index", dir, "embeddings")

    val p1 = indexPath
    val r1 = graft.CacheScope.run {
      Similarity.queries("q82_ann_index")(spark, dir)
        .select("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    spark.catalog.clearCache()
    assert(new java.io.File(s"$p1/meta.properties").isFile,
      "first serve must materialize the index")
    assert(r1.exists(_._2 == 0L), "fixture sanity: vec 0 serves as a neighbor")

    // regenerate IN PLACE: same path, vec 0 gone — a stale index would
    // keep returning it as a neighbor
    val regen = src.filter(col("vec_id") =!= 0L).cache()
    regen.count()
    regen.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    regen.unpersist()

    val p2 = indexPath
    assert(p2 != p1, "fingerprint must change when the fixture is regenerated")
    val r2 = graft.CacheScope.run {
      Similarity.queries("q82_ann_index")(spark, dir)
        .select("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    spark.catalog.clearCache()
    assert(new java.io.File(s"$p2/meta.properties").isFile,
      "regenerated fixture must trigger a rebuild at the new path")
    assert(!r2.exists(_._1 == 0L) && !r2.exists(_._2 == 0L),
      "results served after regeneration must come from the NEW corpus — " +
        "vec 0 no longer exists, a stale index would still emit it")
  }
}
