package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q172 embedding isotropy: range/conservation laws on the real fixture
  * and the collapsed-cone signature on a constructed space.
  */
class IsotropySpec extends SparkSpec {

  test("range and conservation laws (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val rows = Similarity.queries("q172_embedding_isotropy")(spark, dir)
      .collect().map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_vecs"),
        r.getAs[Double]("mean_norm"), r.getAs[Double]("mean_cos")))
    assert(rows.nonEmpty)
    rows.foreach { case (c, n, nrm, cos) =>
      assert(n > 0 && nrm > 0, s"cluster $c: $n / $nrm")
      assert(cos >= -1.0 - 1e-6 && cos <= 1.0 + 1e-6, s"cluster $c cos $cos")
    }
    assert(rows.map(_._2).sum ==
      Tables.load(spark, dir, "embeddings").count(), "row conservation")
  }

  test("a collapsed cone reads mean_cos ≈ 1") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("iso").toString
    // every vector is a positive multiple of (3, 4)/5 with a whisper of
    // per-id spread — the degenerate space cosine dials die in
    val vecs = (0L until 16L).map { i =>
      val a = 1.0f + i * 0.1f
      (i, Seq(a * 0.6f + i * 1e-4f, a * 0.8f))
    }
    vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = Similarity.queries("q172_embedding_isotropy")(spark, tmp)
      .collect().map(r => r.getAs[Double]("mean_cos"))
    assert(rows.nonEmpty)
    rows.foreach(c => assert(c > 0.999, s"cone must read anisotropic: $c"))
  }
}
