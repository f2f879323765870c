package graft.functions.expressions

import graft.functions.{Kernels, Sax}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the remaining per-curve feature kernels
  * (SURVEY §2.12's "promote hot ones"): variogram slope, curve density,
  * and the SAX word. Like [[CurveAbbeExpr]], they read the light-curve
  * arrays as primitive `double[]` straight from Tungsten (`toDoubleArray`,
  * no boxed `Seq[Double]` conversion) and generate direct static calls
  * inside whole-stage codegen — q37's per-user feature projection stays
  * in generated code end to end.
  */
object CurveKernelExprs {

  def variogramSlope(t: ArrayData, v: ArrayData, daysPerBin: Double): Double =
    Kernels.variogramSlope(t.toDoubleArray(), v.toDoubleArray(), daysPerBin)

  def curveDensity(t: ArrayData, v: ArrayData): Double =
    Kernels.curveDensity(t.toDoubleArray(), v.toDoubleArray())

  def saxWord(v: ArrayData, wordSize: Int, alphabetSize: Int): UTF8String =
    UTF8String.fromString(
      Sax.toLetterRep(v.toDoubleArray(), wordSize, alphabetSize).word)

  private[expressions] def dblArr(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  /** Register all curve-kernel functions on a session — idempotent. */
  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark,
      "variogram_slope" -> (exprs => VariogramSlopeExpr(exprs(0), exprs(1), exprs(2))),
      "curve_density" -> (exprs => CurveDensityExpr(exprs(0), exprs(1))),
      "sax_word" -> (exprs => SaxWordExpr(exprs(0), exprs(1), exprs(2))))
}

/** `variogram_slope(time_days, values, days_per_bin)`. */
case class VariogramSlopeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "variogram_slope"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (CurveKernelExprs.dblArr(first.dataType) &&
        CurveKernelExprs.dblArr(second.dataType) && third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"variogram_slope expects (array<double>, array<double>, double), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")

  override protected def nullSafeEval(t: Any, v: Any, d: Any): Any =
    CurveKernelExprs.variogramSlope(
      t.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, v, d) =>
      s"${ev.value} = graft.functions.expressions.CurveKernelExprs.variogramSlope($t, $v, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `curve_density(time_days, values)`. */
case class CurveDensityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "curve_density"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (CurveKernelExprs.dblArr(left.dataType) && CurveKernelExprs.dblArr(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"curve_density expects (array<double>, array<double>), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(t: Any, v: Any): Any =
    CurveKernelExprs.curveDensity(t.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, v) =>
      s"${ev.value} = graft.functions.expressions.CurveKernelExprs.curveDensity($t, $v);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(l, r)
}

/** `sax_word(values, word_size, alphabet_size)` — argument order matches
  * `Sax.toLetterRep`: the PAA word length first, then the alphabet.
  */
case class SaxWordExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def prettyName: String = "sax_word"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (CurveKernelExprs.dblArr(first.dataType) &&
        second.dataType == IntegerType && third.dataType == IntegerType) {
      // bound the dials at ANALYSIS like the signature expressions: a bad
      // literal must not hang (word_size ≤ 0 → zero PAA step) or throw
      // per-row (alphabet outside the Gaussian breakpoint table)
      (SignatureExprs.foldableDial(second), SignatureExprs.foldableDial(third)) match {
        case (Some(ws), _) if ws < 1 =>
          TypeCheckResult.TypeCheckFailure(s"sax_word word_size must be ≥ 1, got $ws")
        case (_, Some(a)) if a < graft.functions.Sax.MinAlphabet ||
            a > graft.functions.Sax.MaxAlphabet =>
          TypeCheckResult.TypeCheckFailure(
            s"sax_word alphabet_size must be in [${graft.functions.Sax.MinAlphabet}, " +
              s"${graft.functions.Sax.MaxAlphabet}], got $a")
        case _ => TypeCheckResult.TypeCheckSuccess
      }
    } else TypeCheckResult.TypeCheckFailure(
      s"sax_word expects (array<double>, int, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")

  override protected def nullSafeEval(v: Any, a: Any, p: Any): Any =
    CurveKernelExprs.saxWord(
      v.asInstanceOf[ArrayData], a.asInstanceOf[Int], p.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, a, p) =>
      s"${ev.value} = graft.functions.expressions.CurveKernelExprs.saxWord($v, $a, $p);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}
