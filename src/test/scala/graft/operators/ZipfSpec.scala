package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q162 Zipf-slope audit: plain-Scala replay, and the calibration
  * signatures — a constructed Zipfian corpus fits ≈ −1, the synthetic
  * near-uniform fixture flattens toward 0 (the audit flagging its own
  * test data as synthetic).
  */
class ZipfSpec extends SparkSpec {

  private def replay(bySource: Map[String, Seq[String]]): Map[String, Option[Double]] =
    bySource.map { case (s, toks) =>
      val ranked = toks.groupBy(identity).toSeq
        .map { case (w, g) => (w, g.size.toLong) }
        .sortBy { case (w, c) => (-c, w) }.take(CorpusOps.ZIPF_TOP)
      val xy = ranked.zipWithIndex.map { case ((_, c), i) =>
        (BigInt(math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5).toLong),
          BigInt(math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong))
      }
      val n = BigInt(xy.size)
      val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      s -> (if (n * sxx == sx * sx) None
      else Some((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble))
    }

  test("q162 matches the plain-Scala replay (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val bySource = Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (s, g) => s -> g.toSeq.flatMap(_.getString(1).split(" ", -1)) }
    val want = replay(bySource)
    val got = CorpusOps.queries("q162_zipf_slope")(spark, dir)
      .collect().map(r => r.getAs[String]("source") ->
        Option(r.get(r.fieldIndex("zipf_slope")))
          .map(_.asInstanceOf[Double])).toMap
    assert(got == want, s"diverged: ${got.toSeq.sortBy(_._1).take(3)} " +
      s"vs ${want.toSeq.sortBy(_._1).take(3)}")
    // the fixture's 31-token near-uniform pool must read as NON-Zipfian
    got.values.flatten.foreach(s =>
      assert(s > -0.5, s"synthetic fixture scored Zipf-like: $s"))
  }

  test("a constructed Zipfian corpus fits slope ≈ −1; a flat one ≈ 0") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("zipf").toString
    // zipf: token t_i appears ⌊1000/i⌋ times; flat: 40 tokens × 25 each
    val zipfToks = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"t$i"))
    val flatToks = (1 to 40).flatMap(i => Seq.fill(25)(s"u$i"))
    val docs = Seq((1L, zipfToks.mkString(" "), "zipf"),
      (2L, flatToks.mkString(" "), "flat"))
    docs.map { case (i, t, s) => (i, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = CorpusOps.queries("q162_zipf_slope")(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("zipf_slope")).toMap
    assert(math.abs(got("zipf") + 1.0) < 0.05, s"zipf slope ${got("zipf")}")
    assert(math.abs(got("flat")) < 0.05, s"flat slope ${got("flat")}")
  }
}
