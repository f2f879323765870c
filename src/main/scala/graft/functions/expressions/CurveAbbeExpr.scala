package graft.functions.expressions

import graft.functions.Kernels
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression for the Abbe-value kernel (SURVEY §2.12:
  * "promote hot ones to Catalyst Expressions"): reads the light-curve
  * arrays as primitive `double[]` straight from Tungsten (`toDoubleArray`,
  * no per-element boxing like a Scala UDF's `Seq[Double]`), and generates
  * a direct static call inside whole-stage codegen.
  *
  * SQL: `curve_abbe(time_array, mag_array, bins)` (bins ≤ 0 → no
  * resampling, like the reference's `getAbbe(bins=None)`).
  */
case class CurveAbbeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "curve_abbe"

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // element type matters: a bare ArrayType check would let array<int>
    // through analysis and toDoubleArray would misread the slots at runtime
    val ok = CurveKernelExprs.dblArr(first.dataType) &&
      CurveKernelExprs.dblArr(second.dataType) && third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"curve_abbe expects (array<double>, array<double>, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override protected def nullSafeEval(t: Any, m: Any, b: Any): Any =
    CurveAbbeExpr.compute(
      t.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, m, b) =>
      s"${ev.value} = graft.functions.expressions.CurveAbbeExpr.compute($t, $m, $b);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

object CurveAbbeExpr {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(time: ArrayData, mag: ArrayData, bins: Int): Double =
    Kernels.curveAbbe(time.toDoubleArray(), mag.toDoubleArray(),
      if (bins > 0) Some(bins) else None)

  /** Register as a SQL function on a session — once (see
    * [[DotProductExpr.register]]).
    */
  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark,
      "curve_abbe" -> (exprs => CurveAbbeExpr(exprs(0), exprs(1), exprs(2))))
}
