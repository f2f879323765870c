package graft.functions

import graft.SparkSpec
import graft.functions.expressions.CurveAbbeExpr
import org.apache.spark.sql.functions._

/** Native expression vs UDF: identical values, and the native path stays
  * boxing-free (smoke-benchmarked, not asserted — timings vary).
  */
class CurveAbbeExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val curves = {
    val rng = new scala.util.Random(11)
    (1 to 2000).map { i =>
      val t = Array.tabulate(300)(j => j * 1.0 + rng.nextDouble() * 0.3)
      val m = t.map(x => 14 + math.sin(x / 9) + rng.nextGaussian() * 0.1)
      (i.toLong, t.toSeq, m.toSeq)
    }.toDF("id", "t", "m").cache()
  }

  test("curve_abbe expression matches the kernel and the UDF") {
    CurveAbbeExpr.register(spark)
    val udfAbbe = udf((t: Seq[Double], m: Seq[Double]) =>
      Kernels.curveAbbe(t.toArray, m.toArray, Some(50)))
    val both = curves
      .withColumn("native", expr("curve_abbe(t, m, 50)"))
      .withColumn("viaUdf", udfAbbe($"t", $"m"))
      .select(max(abs($"native" - $"viaUdf")))
      .head().getDouble(0)
    assert(both == 0.0, s"native vs udf max delta $both")

    // the generated whole-stage code contains the direct static call
    val code = org.apache.spark.sql.execution.debug.codegenString(
      curves.withColumn("a", expr("curve_abbe(t, m, 50)"))
        .queryExecution.executedPlan)
    assert(code.contains("CurveAbbeExpr.compute"),
      "expression did not participate in codegen")

    curves.count() // warm
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tNative = time(curves.select(sum(expr("curve_abbe(t, m, 50)"))).head())
    val tUdf = time(curves.select(sum(udfAbbe($"t", $"m"))).head())
    info(f"native: $tNative%.3fs, udf: $tUdf%.3fs over 2000 curves x 300 pts")
  }
}
