package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression for the float-embedding dot product — the
  * innermost kernel of every similarity operator (q48/q49/q56/q57:
  * cosine = dot / (‖a‖·‖b‖)). Reads both vectors as primitive `float[]`
  * straight from Tungsten (`toFloatArray`, no per-element boxing like a
  * UDF's `Seq[Float]`) and emits a direct static call inside whole-stage
  * codegen, so the probe×candidate scoring loop never leaves generated
  * code.
  *
  * Accumulates in double precision in ascending index order — bit-identical
  * to the UDF it replaces and to the oracle's summation.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "dot_product"

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isFloatArr(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (isFloatArr(left.dataType) && isFloatArr(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects (array<float>, array<float>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.DotProductExpr.compute($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

object DotProductExpr {
  /** Static entry shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toFloatArray()
    val ys = b.toFloatArray()
    val n = math.min(xs.length, ys.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += xs(i).toDouble * ys(i).toDouble; i += 1 }
    s
  }

  /** Register as a SQL function on a session — once; re-registering an
    * already-present function makes SimpleFunctionRegistry WARN on every
    * query that calls through here.
    */
  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark,
      "dot_product" -> (exprs => DotProductExpr(exprs(0), exprs(1))))
}
