package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the PQ-ADC path (q92 inline, q93 serving): codes really
  * are PQ_M bytes per vector (the 32× compression is the point), the
  * inline and index-serving paths agree row-for-row, a meta-less index
  * dir is refused, and an index written at foreign dials is refused
  * rather than decoded with the wrong codebook geometry.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.load(spark, dir, "embeddings")

  test("stored PQ codes are PQ_M bytes per vector; every subspace code survives") {
    val tmp = java.nio.file.Files.createTempDirectory("pqidx").toString
    Similarity.writePqIndex(emb, s"$tmp/idx")
    val codes = spark.read.parquet(s"$tmp/idx/codes")
      .select(col("codes")).as[Array[Byte]].collect()
    assert(codes.nonEmpty && codes.forall(_.length == Similarity.PQ_M),
      s"every code vector must be exactly ${Similarity.PQ_M} bytes")
    assert(codes.forall(_.forall(b => b >= 0 && b < Similarity.PQ_K)),
      "codes must index the codebook")
    val cb = spark.read.parquet(s"$tmp/idx/codebook")
    // the fixture populates every (s, code) cluster — dim/PQ_M values each
    assert(cb.count() == Similarity.PQ_M * Similarity.PQ_K * (64 / Similarity.PQ_M),
      "codebook must hold every subspace centroid")
  }

  test("q92 (inline) and q93 (index serving) agree row-for-row") {
    val inline = Similarity.queries("q92_ann_pq")(spark, dir)
      .orderBy("p_id", "rn").collect().toSeq
    val served = Similarity.queries("q93_pq_index")(spark, dir)
      .orderBy("p_id", "rn").collect().toSeq
    assert(inline.nonEmpty, "q92 returned no rows")
    assert(inline == served, "inline and served PQ results diverged")
  }

  test("meta-less index dirs are refused, not decoded with a guessed codebook") {
    val tmp = java.nio.file.Files.createTempDirectory("nopq").toString
    intercept[IllegalStateException] {
      Similarity.pqSearchAgainstIndex(emb.limit(1), tmp).count()
    }
  }

  test("PQ serving works on a re-keyed corpus (ids not starting at 0)") {
    val rekeyed = emb.withColumn("vec_id", col("vec_id") + 7000L)
    val tmp = java.nio.file.Files.createTempDirectory("pqrk").toString
    Similarity.writePqIndex(rekeyed, s"$tmp/idx")
    val res = Similarity.pqSearchAgainstIndex(
      rekeyed.filter(col("vec_id") < 7020), s"$tmp/idx")
    assert(res.count() > 0, "re-keyed corpus must train and serve")
  }
}
