package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q173 KS split drift: range law on the real fixture (a hash split must
  * read near-zero drift) and the two calibration poles on constructed
  * corpora — identical lengths → D = 0, fully length-separated splits
  * → D = 1.
  */
class SplitDriftSpec extends SparkSpec {

  private def bucket(text: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16) % 100
  }

  private def run(dir: String) = {
    val r = CorpusOps.queries("q173_split_drift")(spark, dir).collect().head
    (r.getAs[Long]("n_train"), r.getAs[Long]("n_test"),
      r.getAs[Long]("at_length"), r.getAs[Double]("d_stat"))
  }

  test("a content-hash split reads near-zero drift (sf0.01)") {
    val (nTr, nTe, _, d) = run("/root/testdata/sf0.01")
    assert(nTr > 0 && nTe > 0)
    assert(d >= 0 && d <= 1, s"D out of range: $d")
    // the split is hash-random w.r.t. length: KS between two samples of
    // the same distribution concentrates near sqrt((na+nb)/(na·nb));
    // allow 4× that before calling the fixture's own split drifted
    val scale = math.sqrt((nTr + nTe).toDouble / (nTr.toDouble * nTe))
    assert(d < 4 * scale, s"hash split drifted: D=$d vs scale $scale")
  }

  test("calibration poles on constructed corpora") {
    import spark.implicits._
    def mine(len: Int, train: Boolean, n: Int): Seq[String] =
      Iterator.from(0).map { i =>
        (Seq(s"seed$i") ++ Seq.fill(len - 1)("w")).mkString(" ")
      }.filter { t =>
        val b = bucket(t)
        if (train) b < 90 else b >= 95
      }.take(n).toSeq
    // full drift: every train doc is short, every test doc long
    val tmp = java.nio.file.Files.createTempDirectory("ksdrift").toString
    val docs = (mine(5, train = true, 15) ++ mine(50, train = false, 15))
      .zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "s0", t.length.toLong)
      }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val (nTr, nTe, atLen, d) = run(tmp)
    assert(nTr == 15 && nTe == 15, s"mined counts: $nTr/$nTe")
    assert(d == 1.0, s"fully separated lengths must read D=1: $d")
    assert(atLen == 5L, s"the gap peaks at the short length: $atLen")
    // null pole: identical single-length distribution on both sides
    val tmp2 = java.nio.file.Files.createTempDirectory("ksnull").toString
    val docs2 = (mine(7, train = true, 15) ++ mine(7, train = false, 15))
      .zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "s0", t.length.toLong)
      }
    docs2.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    val (_, _, _, d2) = run(tmp2)
    assert(d2 == 0.0, s"identical distributions must read D=0: $d2")
  }
}
