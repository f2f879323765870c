package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with spark.sql.extensions=graft.GraftExtensions has the
  * native functions available in pure SQL with no imperative registration.
  * (Forked tests run suites sequentially, so cycling the shared session
  * here is safe — later suites lazily getOrCreate a fresh one.)
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject curve_abbe and dot_product at session start") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val d = spark.sql(
        "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
      assert(d == 11.0)
      val a = spark.sql(
        "SELECT curve_abbe(array(1.0D, 2.0D, 3.0D, 4.0D), " +
          "array(1.0D, 2.0D, 1.0D, 2.0D), 0) AS a").head().getDouble(0)
      assert(a > 0.0 && !a.isNaN)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
