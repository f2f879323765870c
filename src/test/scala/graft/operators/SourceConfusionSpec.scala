package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q161 source-confusion matrix: plain-Scala replay and the Gibbs
  * signatures on constructed sources (disjoint vocab → diagonal wins
  * big; identical distributions → exactly equal cells).
  */
class SourceConfusionSpec extends SparkSpec {

  private def replay(byuSource: Map[String, Seq[String]]): Map[(String, String), Double] = {
    val counts = byuSource.map { case (s, toks) =>
      s -> toks.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    }
    val totals = counts.map { case (s, m) => s -> m.values.sum }
    val v = counts.values.flatMap(_.keys).toSet.size.toLong
    (for {
      (a, ca) <- counts; (b, cb) <- counts
    } yield {
      val hm = ca.map { case (w, cs) =>
        val ratio = (totals(b) + v).toDouble / (cb.getOrElse(w, 0L) + 1).toDouble
        cs * math.floor(math.log(ratio) * 1e6 + 0.5).toLong
      }.sum
      (a, b) -> math.floor(hm.toDouble / totals(a) / 1e6 * 1e6 + 0.5) / 1e6
    }).toMap
  }

  private def run(dir: String): Map[(String, String), Double] =
    CorpusOps.queries("q161_source_confusion")(spark, dir)
      .collect().map(r => (r.getAs[String]("source_a"),
        r.getAs[String]("source_b")) -> r.getAs[Double]("cross_entropy")).toMap

  test("q161 matches the plain-Scala replay (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val bySource = Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (s, g) =>
        s -> g.toSeq.flatMap(_.getString(1).split(" ", -1))
      }
    val want = replay(bySource)
    val got = run(dir)
    assert(got.size == bySource.size * bySource.size,
      s"matrix must be m²: ${got.size}")
    assert(got == want, s"diverged on ${got.toSeq.diff(want.toSeq).take(3)}")
  }

  test("Gibbs signatures on constructed sources") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("conf").toString
    // da/db: disjoint vocabularies. tw: the IDENTICAL distribution as da.
    val da = Seq.fill(20)("alpha beta gamma alpha beta")
    val db = Seq.fill(20)("delta epsilon zeta delta epsilon")
    val docs = da.zipWithIndex.map { case (t, i) => (i.toLong, t, "da") } ++
      db.zipWithIndex.map { case (t, i) => (100L + i, t, "db") } ++
      da.zipWithIndex.map { case (t, i) => (200L + i, t, "tw") }
    docs.map { case (i, t, s) => (i, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = run(tmp)
    // disjoint vocab: reading da under db's LM costs far more than under
    // its own (every token smooths to count 0)
    assert(m(("da", "db")) > m(("da", "da")) + 1.0,
      s"disjoint sources must confuse: $m")
    assert(m(("db", "da")) > m(("db", "db")) + 1.0)
    // identical distribution: the twin's LM prices da EXACTLY like its
    // own (same counts, same totals → bit-identical cells)
    assert(m(("da", "tw")) == m(("da", "da")), s"twin drifted: $m")
    assert(m(("tw", "da")) == m(("tw", "tw")))
    // and the diagonal is each row's minimum here (Gibbs)
    Seq("da", "db", "tw").foreach { s =>
      val row = Seq("da", "db", "tw").map(t => m((s, t)))
      assert(row.min == m((s, s)), s"row $s: $row")
    }
  }

  test("the m^2 shape refuses loudly above MAX_CONFUSION_SOURCES") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("confcap").toString
    val n = (CorpusOps.MAX_CONFUSION_SOURCES + 1).toInt
    (0 until n).map(i => (i.toLong, "alpha beta", "en", s"src$i", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.CacheScope.run {
        CorpusOps.queries("q161_source_confusion")(spark, tmp).collect()
      }
    }
    assert(e.getMessage.contains("MAX_CONFUSION_SOURCES"), e.getMessage)
  }
}
