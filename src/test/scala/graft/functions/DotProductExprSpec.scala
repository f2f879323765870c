package graft.functions

import graft.SparkSpec
import graft.functions.expressions.DotProductExpr
import org.apache.spark.sql.functions._

/** Native dot-product expression vs UDF: bit-identical sums (same index
  * order, double accumulation) and whole-stage-codegen participation.
  */
class DotProductExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rng = new scala.util.Random(23)
    (1 to 2000).map { i =>
      (i.toLong,
        Seq.fill(128)(rng.nextFloat() * 2 - 1),
        Seq.fill(128)(rng.nextFloat() * 2 - 1))
    }.toDF("id", "a", "b").cache()
  }

  test("dot_product expression matches the UDF bit-for-bit and codegens") {
    DotProductExpr.register(spark)
    val udfDot = udf((a: Seq[Float], b: Seq[Float]) => {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    })
    val delta = vecs
      .withColumn("native", expr("dot_product(a, b)"))
      .withColumn("viaUdf", udfDot($"a", $"b"))
      .select(max(abs($"native" - $"viaUdf")))
      .head().getDouble(0)
    assert(delta == 0.0, s"native vs udf max delta $delta (must be bit-identical)")

    // null-safety: null vector → null result
    val withNull = Seq((1L, Seq(1.0f), Option.empty[Seq[Float]]))
      .toDF("id", "a", "b")
      .withColumn("d", expr("dot_product(a, b)"))
    assert(withNull.head().isNullAt(2))

    // the generated whole-stage code contains the direct static call
    val code = org.apache.spark.sql.execution.debug.codegenString(
      vecs.withColumn("d", expr("dot_product(a, b)"))
        .queryExecution.executedPlan)
    assert(code.contains("DotProductExpr.compute"),
      "expression did not participate in codegen")

    vecs.count() // warm
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tNative = time(vecs.select(sum(expr("dot_product(a, b)"))).head())
    val tUdf = time(vecs.select(sum(udfDot($"a", $"b"))).head())
    info(f"native: $tNative%.3fs, udf: $tUdf%.3fs over 2000 pairs x 128 dims")
  }
}
