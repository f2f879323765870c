package graft

import graft.functions.expressions.{CurveAbbeExpr, CurveDensityExpr, DotProductExpr, LshBandSigsExpr, MinhashKExpr, MinhashSigExpr, SaxWordExpr, SigMatchExpr, SimhashBitsExpr, SimhashExpr, VariogramSlopeExpr, WinnowFpsExpr}
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
    ext.injectFunction((
      FunctionIdentifier("simhash16"),
      new ExpressionInfo(classOf[SimhashExpr].getName, "simhash16"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimhashExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash16"),
      new ExpressionInfo(classOf[MinhashSigExpr].getName, "minhash16"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashSigExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("lsh_band_sigs"),
      new ExpressionInfo(classOf[LshBandSigsExpr].getName, "lsh_band_sigs"),
      graft.functions.expressions.SignatureExprs.lshBandSigsBuilder))
    ext.injectFunction((
      FunctionIdentifier("variogram_slope"),
      new ExpressionInfo(classOf[VariogramSlopeExpr].getName, "variogram_slope"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VariogramSlopeExpr(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("curve_density"),
      new ExpressionInfo(classOf[CurveDensityExpr].getName, "curve_density"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CurveDensityExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("sax_word"),
      new ExpressionInfo(classOf[SaxWordExpr].getName, "sax_word"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SaxWordExpr(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFpsExpr].getName, "winnow_fps"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFpsExpr(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("sig_match16"),
      new ExpressionInfo(classOf[SigMatchExpr].getName, "sig_match16"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SigMatchExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimhashBitsExpr].getName, "simhash_bits"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimhashBitsExpr(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_k"),
      new ExpressionInfo(classOf[MinhashKExpr].getName, "minhash_k"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinhashKExpr(exprs(0), exprs(1))))
    // SQL names for Spark's own bloom sketch expressions (shared builders
    // with the imperative BloomFns.register path — see BloomFns)
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      graft.functions.expressions.BloomFns.bloomAggBuilder))
    ext.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      graft.functions.expressions.BloomFns.mightContainBuilder))
  }
}
