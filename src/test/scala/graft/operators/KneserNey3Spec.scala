package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q185/q186 interpolated trigram Kneser–Ney: plain-Scala replay of the
  * exact integer form at both dials (exact and gtmin=2), the prune
  * monotonicity law, and the backoff identity — a pruned trigram scores
  * EXACTLY the continuation-only value interpolated KN assigns an unseen
  * trigram.
  */
class KneserNey3Spec extends SparkSpec {

  private case class Stats3(c123: Map[(String, String, String), Long],
                            c12: Map[(String, String), Long],
                            n1pCtx: Map[(String, String), Long],
                            e: Map[(String, String), Long],
                            f: Map[String, Long],
                            g: Map[String, Long],
                            h: Map[String, Long],
                            t: Long)

  private def stats3Of(docs: Seq[(Long, Array[String])]): Stats3 = {
    val tris = docs.flatMap { case (_, toks) =>
      if (toks.length > 2)
        (0 until toks.length - 2).map(i => (toks(i), toks(i + 1), toks(i + 2)))
      else Nil
    }
    val c123 = tris.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cont = c123.keysIterator.map(k => (k._2, k._3)).toSeq.distinct
    Stats3(c123,
      c123.groupBy(k => (k._1._1, k._1._2)).map { case (k, v) => k -> v.values.sum },
      c123.groupBy(k => (k._1._1, k._1._2)).map { case (k, v) => k -> v.size.toLong },
      c123.groupBy(k => (k._1._2, k._1._3)).map { case (k, v) => k -> v.size.toLong },
      c123.groupBy(_._1._2).map { case (k, v) => k -> v.size.toLong },
      cont.groupBy(_._1).map { case (k, v) => k -> v.size.toLong },
      cont.groupBy(_._2).map { case (k, v) => k -> v.size.toLong },
      cont.size.toLong)
  }

  /** The exact integer form — `pruned` selects the continuation-only
    * backoff numerator (what an unseen trigram scores).
    */
  private def nll3Micro(s: Stats3, w1: String, w2: String, w3: String,
                        pruned: Boolean): Long = {
    val p2num = (4L * s.e((w2, w3)) - 3L) * s.t + 3L * s.g(w2) * s.h(w3)
    val num =
      if (pruned) 3L * s.n1pCtx((w1, w2)) * p2num
      else (4L * s.c123((w1, w2, w3)) - 3L) * 4L * s.f(w2) * s.t +
        3L * s.n1pCtx((w1, w2)) * p2num
    val nll = math.log((16L * s.c12((w1, w2)) * s.f(w2) * s.t).toDouble) -
      math.log(num.toDouble)
    math.floor(nll * 1e6 + 0.5).toLong
  }

  private def loadDocs(dir: String): Seq[(Long, Array[String])] =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1))).toSeq

  private def replay(d: Seq[(Long, Array[String])], s: Stats3,
                     minCount: Long): Map[Long, (Long, Double)] =
    d.filter(_._2.length > 2).map { case (id, toks) =>
      val ms = (0 until toks.length - 2).map { i =>
        val k = (toks(i), toks(i + 1), toks(i + 2))
        nll3Micro(s, k._1, k._2, k._3, pruned = s.c123(k) < minCount)
      }
      id -> (ms.length.toLong,
        math.floor(ms.sum.toDouble / ms.length / 1e6 * 1e6 + 0.5) / 1e6)
    }.toMap

  private def run(name: String, dir: String): Map[Long, (Long, Double)] =
    CorpusOps.queries(name)(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("avg_nll"))).toMap

  test("q185 matches the plain-Scala integer-form replay (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val d = loadDocs(dir)
    val want = replay(d, stats3Of(d), minCount = 1L)
    val got = run("q185_kn_trigram", dir)
    assert(got.size == want.size)
    val diverged = want.collect { case (id, w) if got(id) != w => (id, got(id), w) }
    assert(diverged.isEmpty, s"diverged: ${diverged.take(3)}")
  }

  test("q186 matches the replay with the gtmin=2 backoff; pruning only raises nll") {
    val dir = "/root/testdata/sf0.001"
    val d = loadDocs(dir)
    val s = stats3Of(d)
    val want = replay(d, s, minCount = 2L)
    val got = run("q186_kn3_pruned", dir)
    val diverged = want.collect { case (id, w) if got(id) != w => (id, got(id), w) }
    assert(diverged.isEmpty, s"diverged: ${diverged.take(3)}")
    // the prune drops only positive direct mass → per-doc nll moves up
    val exact = run("q185_kn_trigram", dir)
    val violated = exact.collect {
      case (id, (_, nll)) if got(id)._2 < nll - 1e-6 => (id, nll, got(id)._2)
    }
    assert(violated.isEmpty, s"pruning lowered nll: ${violated.take(3)}")
    assert(exact.exists { case (id, (_, nll)) => got(id)._2 > nll },
      "fixture corpus must contain hapax trigrams for this law to bite")
    assert(s.c123.values.exists(_ == 1L), "hapax trigram types must exist")
  }

  test("a pruned trigram scores exactly the unseen-trigram backoff") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kn3").toString
    // "big red dog" occurs once (hapax → pruned at gtmin=2); "big red cat"
    // occurs three times (kept). Both share the context "big red", so the
    // dial isolates the numerator switch.
    val docs = Seq(
      (1L, "big red cat x1 big red cat x2 big red cat"),
      (2L, "big red dog"),
      (3L, "one red dog two red dog"))
      .map { case (i, t) => (i, t, "en", "s0", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val d = loadDocs(tmp)
    val s = stats3Of(d)
    assert(s.c123(("big", "red", "dog")) == 1L)
    assert(s.c123(("big", "red", "cat")) == 3L)
    // doc 2 is the single pruned trigram: its avg_nll IS the backoff value
    val got = run("q186_kn3_pruned", tmp)
    val backoff = nll3Micro(s, "big", "red", "dog", pruned = true) / 1e6
    assert(got(2L) == ((1L, math.floor(backoff * 1e6 + 0.5) / 1e6)),
      s"pruned hapax must take the continuation-only backoff: ${got(2L)} vs $backoff")
    // and the backoff is strictly cheaper than nothing-at-all but costlier
    // than the kept trigram's direct-mass value
    val keptVal = nll3Micro(s, "big", "red", "cat", pruned = false)
    assert(nll3Micro(s, "big", "red", "dog", pruned = true) > keptVal,
      "the hapax backoff must cost more than the 3-count kept trigram")
    // the exact dial scores the same trigram WITH direct mass — cheaper
    assert(run("q185_kn_trigram", tmp)(2L)._2 < got(2L)._2,
      "exact KN keeps the hapax's direct mass, so its nll must be lower")
  }
}
