package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the SQ8 scalar-quantized ANN path (q90 inline, q91
  * serving): the codes really are one byte per dimension (the 4×
  * corpus-residency win is the whole point), reconstruction error is
  * bounded by half a quantization step, the inline and index-serving
  * paths agree row-for-row, and a meta-less index dir is refused rather
  * than served with a guessed quantizer.
  */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.load(spark, dir, "embeddings")

  test("stored codes are one byte per dimension with bounded reconstruction error") {
    val tmp = java.nio.file.Files.createTempDirectory("sq8idx").toString
    Similarity.writeSq8Index(emb, s"$tmp/idx")
    val qz = spark.read.parquet(s"$tmp/idx/quantizer").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    val dim = qz.length
    val codes = spark.read.parquet(s"$tmp/idx/codes")
      .select(col("c_id"), col("codes")).as[(Long, Array[Byte])].collect().toMap
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    assert(codes.nonEmpty && codes.values.forall(_.length == dim),
      s"every code vector must be exactly $dim bytes")
    // midpoint reconstruction is within half a step of the original:
    // |rv - v| <= span/256/2 + ulp slack; span==0 dims reconstruct to mn
    var worstRel = 0.0
    for ((id, bs) <- codes; i <- 0 until dim) {
      val (_, mn, span) = qz(i)
      val c = bs(i).toInt + 128
      val rv = mn + (c + 0.5) * span / 256.0
      val v = vecs(id)(i).toDouble
      val tol = if (span == 0.0) 1e-12 else span / 512.0 + 1e-9
      assert(math.abs(rv - v) <= tol,
        f"dim $i vec $id: |recon $rv%.6f - v $v%.6f| exceeds half-step $tol%.6g")
      if (span > 0) worstRel = math.max(worstRel, math.abs(rv - v) / span)
    }
    info(f"worst reconstruction error = $worstRel%.4f of the dimension span (bound 0.5/256 + eps)")
  }

  test("q90 (inline) and q91 (index serving) agree row-for-row") {
    val inline = Similarity.queries("q90_ann_sq8")(spark, dir)
      .orderBy("p_id", "rn").collect().toSeq
    val served = Similarity.queries("q91_sq8_index")(spark, dir)
      .orderBy("p_id", "rn").collect().toSeq
    assert(inline.nonEmpty, "q90 returned no rows")
    assert(inline == served, "inline and served SQ8 results diverged")
  }

  test("meta-less index dirs are refused, not served with a guessed quantizer") {
    val tmp = java.nio.file.Files.createTempDirectory("nosq8").toString
    intercept[IllegalStateException] {
      Similarity.sq8SearchAgainstIndex(emb.limit(1), tmp).count()
    }
  }

  test("SQ8 serving works on a re-keyed corpus (ids not starting at 0)") {
    val rekeyed = emb.withColumn("vec_id", col("vec_id") + 5000L)
    val tmp = java.nio.file.Files.createTempDirectory("sq8rk").toString
    Similarity.writeSq8Index(rekeyed, s"$tmp/idx")
    val res = Similarity.sq8SearchAgainstIndex(
      rekeyed.filter(col("vec_id") < 5020), s"$tmp/idx")
    assert(res.count() > 0, "re-keyed corpus must quantize and serve")
  }
}
