package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q151 interpolated Kneser–Ney: plain-Scala replay of the exact integer
  * probability form, the measured ln rounding margin at the driver's gate
  * scale, and the continuation-probability signature the smoothing exists
  * for ("francisco" is cheap only after "san").
  */
class KneserNeySpec extends SparkSpec {

  private case class Stats(c12: Map[(String, String), Long],
                           c1: Map[String, Long],
                           n1pW1: Map[String, Long],
                           n1pW2: Map[String, Long],
                           t: Long)

  private def statsOf(docs: Seq[(Long, Array[String])]): Stats = {
    val pairs = docs.flatMap { case (_, toks) =>
      toks.iterator.zip(toks.iterator.drop(1)).toSeq
    }
    val c12 = pairs.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    Stats(c12,
      c12.groupBy(_._1._1).map { case (w, g) => w -> g.values.sum },
      c12.groupBy(_._1._1).map { case (w, g) => w -> g.size.toLong },
      c12.groupBy(_._1._2).map { case (w, g) => w -> g.size.toLong },
      c12.size.toLong)
  }

  private def nllMicro(s: Stats, w1: String, w2: String): Long = {
    val num = (4L * s.c12((w1, w2)) - 3L) * s.t + 3L * s.n1pW1(w1) * s.n1pW2(w2)
    val nll = math.log((4L * s.c1(w1) * s.t).toDouble) - math.log(num.toDouble)
    math.floor(nll * 1e6 + 0.5).toLong
  }

  private def loadDocs(dir: String): Seq[(Long, Array[String])] =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1))).toSeq

  test("q151 matches the plain-Scala integer-form replay (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val d = loadDocs(dir)
    val s = statsOf(d)
    val want = d.filter(_._2.length > 1).map { case (id, toks) =>
      val ms = toks.iterator.zip(toks.iterator.drop(1))
        .map(p => nllMicro(s, p._1, p._2)).toSeq
      id -> (ms.length.toLong,
        math.floor(ms.sum.toDouble / ms.length / 1e6 * 1e6 + 0.5) / 1e6)
    }.toMap
    val got = CorpusOps.queries("q151_kneser_ney")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    assert(got.size == want.size)
    val diverged = want.collect {
      case (id, w) if got(id) != w => (id, got(id), w)
    }
    assert(diverged.isEmpty, s"diverged: ${diverged.take(3)}")
  }

  test("pruned KN: min_count=1 is the identity; pruning only ever raises nll") {
    val dir = "/root/testdata/sf0.001"
    // minCount=1 keeps every observed type (c12 >= 1 always) — the pruned
    // path must reproduce q151 exactly, so the left-join restructuring
    // cannot drift from the gated query
    val exact = CorpusOps.queries("q151_kneser_ney")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    val ident = CorpusOps.knPerplexityPruned(
      graft.Tables.load(spark, dir, "documents"), minCount = 1L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    assert(ident == exact, "minCount=1 must equal exact KN bigram-for-bigram")
    // minCount=2 drops only positive direct mass (c12−D)/c1 from hapax
    // types → every per-doc avg_nll moves UP or stays (within one
    // 1e-6-unit rounding step per doc)
    val pruned = CorpusOps.knPerplexityPruned(
      graft.Tables.load(spark, dir, "documents"), minCount = 2L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    assert(pruned.keySet == exact.keySet)
    val violated = exact.collect {
      case (id, (n, nll)) if pruned(id)._2 < nll - 1e-6 => (id, nll, pruned(id)._2)
    }
    assert(violated.isEmpty, s"pruning lowered nll: ${violated.take(3)}")
    assert(exact.exists { case (id, (_, nll)) => pruned(id)._2 > nll },
      "fixture corpus must contain hapax bigrams for this law to bite")
  }

  test("rounding margin: nll*1e6 sits far from every half-integer (sf0.01)") {
    // per distinct scored tuple, the pre-round value's distance from a
    // .5 boundary must dwarf what a cross-engine ln ulp can move it:
    // nll ≲ 40 nats → scaled ≲ 4e7, rel 1e-16 → drift ≲ 4e-9
    val s = statsOf(loadDocs("/root/testdata/sf0.01"))
    val margins = s.c12.keysIterator.map { case (w1, w2) =>
      val num = (4L * s.c12((w1, w2)) - 3L) * s.t +
        3L * s.n1pW1(w1) * s.n1pW2(w2)
      val x = (math.log((4L * s.c1(w1) * s.t).toDouble) -
        math.log(num.toDouble)) * 1e6
      math.abs(x - math.floor(x) - 0.5)
    }
    val minMargin = margins.min
    assert(minMargin > 1e-4,
      s"a bigram's nll*1e6 sits $minMargin from a rounding boundary")
  }

  test("continuation signature: one-history tokens cost more at matched counts") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kn151").toString
    // the target bigrams (san→francisco, rob→said) match on EVERY count
    // the formula reads — c12 = 3, c1(w1) = 3, N1+(w1·) = 1 — except the
    // continuation breadth: "said" follows 3 distinct words (rob/ann/eve)
    // while "francisco" only ever follows "san", so the nll gap is PURE
    // continuation probability.
    val docs = Seq(
      (1L, "san francisco a1 san francisco a2 san francisco"),
      (2L, "rob said b1 rob said b2 rob said"),
      (3L, "ann said eve said"))
      .map { case (i, t) => (i, t, "en", "s0", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val s = statsOf(loadDocs(tmp))
    assert(s.c12(("san", "francisco")) == 3L && s.c12(("rob", "said")) == 3L)
    assert(s.c1("san") == 3L && s.c1("rob") == 3L)
    assert(s.n1pW1("san") == 1L && s.n1pW1("rob") == 1L)
    assert(s.n1pW2("francisco") == 1L && s.n1pW2("said") == 3L)
    val fr = nllMicro(s, "san", "francisco")
    val sd = nllMicro(s, "rob", "said")
    assert(fr > sd,
      s"francisco (one history) must cost more than said: $fr vs $sd")
    // and the query agrees with the replay on this corpus end-to-end
    val got = CorpusOps.queries("q151_kneser_ney")(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_nll")).toMap
    val want = loadDocs(tmp).filter(_._2.length > 1).map { case (id, toks) =>
      val ms = toks.iterator.zip(toks.iterator.drop(1))
        .map(p => nllMicro(s, p._1, p._2)).toSeq
      id -> math.floor(ms.sum.toDouble / ms.length / 1e6 * 1e6 + 0.5) / 1e6
    }.toMap
    assert(got == want, s"got $got want $want")
  }
}
