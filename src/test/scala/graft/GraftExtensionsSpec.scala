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
      // the signature + curve-kernel families inject too
      val sh = spark.sql("SELECT simhash16(array('a', 'b', 'a')) AS s")
        .head().getLong(0)
      assert(sh >= 0L && sh < (1L << 16))
      val mh = spark.sql("SELECT minhash16(array('x y z')) AS m")
        .head().getSeq[Long](0)
      assert(mh.length == 16 && mh.forall(_ >= 0L))
      val bs = spark.sql(
        "SELECT lsh_band_sigs(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 4) AS b")
        .head().getSeq[Long](0)
      assert(bs.length == 4)
      // sax_word(values, word_size, alphabet_size): 4-letter word over a
      // 5-letter alphabet (kernel parity is golden-pinned in SaxSpec)
      val sw = spark.sql(
        "SELECT sax_word(array(1.0D, 2.0D, 3.0D, 4.0D, 5.0D, 6.0D, 7.0D, 8.0D, " +
          "9.0D, 10.0D), 4, 5) AS w").head().getString(0)
      assert(sw.length == 4 && sw.forall(c => c >= 'a' && c <= 'e'), sw)
      val vs = spark.sql(
        "SELECT variogram_slope(array(1.0D, 2.0D, 3.0D, 4.0D), " +
          "array(1.0D, 2.0D, 1.0D, 2.0D), 1.0D) AS v").head()
      assert(!vs.isNullAt(0))
      val cd = spark.sql(
        "SELECT curve_density(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D)) AS c")
        .head().getDouble(0)
      assert(!cd.isNaN)
      // 30 chars >= gram(20)+window(10)-1, so at least one fingerprint
      val wf = spark.sql(
        "SELECT winnow_fps('abcdefghijklmnopqrstuvwxyz0123') AS f")
        .head().getSeq[Long](0)
      assert(wf.nonEmpty && wf.forall(_ >= 0L))
      // sig_match16: THE shared minhash estimator — identical arrays → 1.0,
      // and 16-slot signatures agreeing on none → 0.0
      val sm = spark.sql(
        "SELECT sig_match16(minhash16(array('x y z')), minhash16(array('x y z'))) AS s")
        .head().getDouble(0)
      assert(sm == 1.0)
      // ad-hoc SQL: a NULL slot is never a match (not a phantom 0), and
      // empty signatures score 0.0 rather than NaN
      val smNull = spark.sql(
        "SELECT sig_match16(array(CAST(NULL AS BIGINT)), array(CAST(NULL AS BIGINT))) AS s")
        .head().getDouble(0)
      assert(smNull == 0.0)
      val smEmpty = spark.sql(
        "SELECT sig_match16(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)) AS s")
        .head().getDouble(0)
      assert(smEmpty == 0.0)
      // ad-hoc SQL niceties (ADVICE r7): null ELEMENTS are skipped, not NPE
      val mhNull = spark.sql("SELECT minhash16(array('a', NULL)) AS m")
        .head().getSeq[Long](0)
      val mhPlain = spark.sql("SELECT minhash16(array('a')) AS m")
        .head().getSeq[Long](0)
      assert(mhNull == mhPlain)
      val shNull = spark.sql("SELECT simhash16(array('a', NULL, 'b')) AS s")
        .head().getLong(0)
      val shPlain = spark.sql("SELECT simhash16(array('a', 'b')) AS s")
        .head().getLong(0)
      assert(shNull == shPlain)
      // non-positive band count fails analysis with a readable message
      val err = intercept[Exception] {
        spark.sql("SELECT lsh_band_sigs(array(CAST(0.5 AS FLOAT)), 0) AS b").collect()
      }
      assert(err.getMessage.contains("positive band count"), err.getMessage)
      // 3-arg dial form: explicit LSH_BITS equals the 2-arg default; a
      // narrower dial stays inside its band space
      val bs2 = spark.sql(
        "SELECT lsh_band_sigs(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 4, " +
          graft.functions.expressions.SignatureExprs.LSH_BITS + ") AS b")
        .head().getSeq[Long](0)
      assert(bs2 == spark.sql(
        "SELECT lsh_band_sigs(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 4) AS b")
        .head().getSeq[Long](0))
      val bs4 = spark.sql(
        "SELECT lsh_band_sigs(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 4, 4) AS b")
        .head().getSeq[Long](0)
      assert(bs4.length == 4 && bs4.forall(s => s >= 0L && s < 16L), bs4.toString)
      // bits-per-band dial out of range fails analysis too
      val err3 = intercept[Exception] {
        spark.sql("SELECT lsh_band_sigs(array(CAST(0.5 AS FLOAT)), 4, 63) AS b").collect()
      }
      assert(err3.getMessage.contains("bits per band"), err3.getMessage)
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
