package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q146 weighted sampling + q147 snapshot diff: plain-Scala replays of
  * both chains, the ln-rounding margin guard, and the
  * partitioning-independence of the content-addressed draw.
  */
class SnapshotSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Spark's round(x, 6): HALF_UP on the double's shortest decimal. */
  private def r6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  private lazy val corpus: Seq[(Long, String, String)] =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("source"))).toSeq

  /** (id, source, w, keyU, half-integer margin of key·1e6). */
  private lazy val keyed: Seq[(Long, String, Double, Long, Double)] =
    corpus.map { case (id, text, source) =>
      val toks = text.split(" ", -1)
      val w = toks.distinct.length.toDouble / toks.length
      val h = java.lang.Long.parseLong(md5hex(s"ws:$id").substring(0, 15), 16)
      val u = (h + 1L) / 1.152921504606846976e18
      val x = (math.log(u) / w) * 1e6
      (id, source, w, math.floor(x + 0.5).toLong,
        math.abs(x - math.floor(x) - 0.5))
    }

  test("q146 matches the plain-Scala Efraimidis-Spiliopoulou replay") {
    val want = keyed.sortBy { case (id, _, _, k, _) => (-k, id) }
      .take(CorpusOps.WS_K).zipWithIndex.map { case ((id, src, w, k, _), i) =>
        (i + 1, id, src, r6(w), k / 1e6)
      }
    val got = CorpusOps.q146WeightedSample(spark, dir).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Double]("w"),
        r.getAs[Double]("es_key"))).toSeq
    assert(got == want, s"sample diverged:\n got ${got.take(5)}…\nwant ${want.take(5)}…")
    // the margin that keeps the 1e-6-unit key safe from a cross-engine
    // ln ulp (≲ 1e-8 on the e6 scale; min margin shrinks ∝ 1/N —
    // measured 3.7e-5 over the 500-doc fixture, floor set 100× the drift)
    val worst = keyed.map(_._5).min
    assert(worst > 1e-6, s"key margin too thin: $worst")
  }

  test("q146 is partitioning-independent: the draw is content-addressed") {
    val base = CorpusOps.q146WeightedSample(spark, dir).collect().map(_.toSeq)
    // the SAME corpus rewritten into 13 arbitrary partitions must draw
    // the IDENTICAL sample — u is keyed on content, not RNG state
    val tmp = java.nio.file.Files.createTempDirectory("wsrepart").toString
    Tables.load(spark, dir, "documents").repartition(13)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val re = CorpusOps.q146WeightedSample(spark, tmp).collect().map(_.toSeq)
    assert(re.sameElements(base), "repartitioned corpus drew a different sample")
  }

  test("q147 matches the plain-Scala set-arithmetic replay") {
    val o = corpus.filter(_._1 % 7 != 0)
      .map { case (id, t, s) => id -> (s, md5hex(t)) }.toMap
    val n = corpus.filter(_._1 % 5 != 0)
      .map { case (id, t, s) =>
        id -> (s, md5hex(if (id % 11 == 0) t + " rev2" else t))
      }.toMap
    val want = (o.keySet ++ n.keySet).toSeq.map { id =>
      val cls =
        if (!n.contains(id)) "removed"
        else if (!o.contains(id)) "added"
        else if (o(id)._2 != n(id)._2) "modified"
        else "unchanged"
      (o.get(id).orElse(n.get(id)).get._1, cls)
    }.groupBy(identity).map { case ((src, cls), g) => (src, cls, g.size.toLong) }
      .toSet
    val got = CorpusOps.q147SnapshotDiff(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("diff_class"),
        r.getAs[Long]("n_docs"))).toSet
    assert(got == want, s"diff census diverged:\n got $got\nwant $want")
    // the fixture must actually exercise every class
    val classes = want.map(_._2)
    assert(Set("added", "removed", "modified", "unchanged").subsetOf(classes),
      s"fixture missed a diff class: $classes")
  }
}
