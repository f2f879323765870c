package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q171 mix Gini: plain-Scala replay, range laws, and the calibration
  * extremes (equal masses → exactly 0; a one-source-owns-it mix → near
  * (n−1)/n).
  */
class GiniSpec extends SparkSpec {

  private def gini(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val n = s.size.toLong
    val num = s.zipWithIndex.map { case (x, i) => (2L * (i + 1) - n - 1) * x }.sum
    num.toDouble / (n * s.sum).toDouble
  }

  test("q171 matches the plain-Scala replay and the range law (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val counts = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("lang"), col("source")).agg(sum(col("n")).as("n_s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = counts.groupBy(_._2).map { case (_, g) => g.map(_._3).sum }.toSeq
    val want = counts.groupBy(_._1)
      .map { case (l, g) => l -> gini(g.map(_._3).toSeq) } + ("*" -> gini(bySrc))
    val got = CorpusOps.queries("q171_mix_gini")(spark, dir)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("gini")).toMap
    assert(got == want, s"diverged: $got vs $want")
    got.values.foreach(g => assert(g >= 0 && g < 1, s"gini out of range: $g"))
  }

  test("calibration extremes on constructed mixes") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("gini").toString
    // eq: 4 sources × identical mass → G = 0 exactly.
    // sk: one source holds ~everything → G → (n−1)/n = 0.75.
    val docs =
      (0 until 4).map(i => (i.toLong, "a b c d e", "eq", s"s$i")) ++
        ((10L, "x", "sk", "t0") +: (11 to 13).map(i =>
          (i.toLong, Seq.fill(300)("y").mkString(" "), "sk", "t1")))
    docs.map { case (i, t, l, s) => (i, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = CorpusOps.queries("q171_mix_gini")(spark, tmp)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_sources"), r.getAs[Double]("gini"))).toMap
    assert(got("eq") == ((4L, 0.0)), s"equal mix: ${got("eq")}")
    val (nSk, gSk) = got("sk")
    assert(nSk == 2 && gSk > 0.45 && gSk < 0.5,
      s"two-source 900:1 skew → G just under 1/2: ${got("sk")}")
  }
}
