package graft

import graft.functions.expressions.{CurveAbbeExpr, DotProductExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Standard Spark extension entry point: register the library's native
  * Catalyst expressions on every session built with
  * `spark.sql.extensions=graft.GraftExtensions` — no imperative
  * `register(spark)` calls needed, and the functions exist in pure-SQL
  * contexts (thriftserver, `spark.sql(...)`) from session start.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("curve_abbe"),
      new ExpressionInfo(classOf[CurveAbbeExpr].getName, "curve_abbe"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CurveAbbeExpr(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductExpr(exprs(0), exprs(1))))
  }
}
