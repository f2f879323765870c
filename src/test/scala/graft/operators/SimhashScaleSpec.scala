package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The simhash bit width is the operator's scale dial: at corpus size
  * N >> 2^bits unrelated documents collide into the same band buckets
  * (the candidate join goes quadratic) and even full-hash hamming stops
  * discriminating. These tests pin (a) the generalized path reproduces
  * the 16-bit reference dial exactly, (b) widening the hash collapses
  * spurious candidates while keeping every planted near-dup — the
  * measured justification for running 48+ bits at 100 TB.
  */
class SimhashScaleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // 400 unrelated docs over a tiny vocabulary (heavy 16-bit collisions)
    // + 5 planted duplicate pairs (verbatim copies under new ids — what a
    // hamming ≤ 2 gate GUARANTEES to catch; a changed token shifts every
    // bit's vote margin by up to 2, so short one-token-edited docs
    // legitimately land past the gate at any width)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(7)
    val base = (0 until 400).map { i =>
      (i.toLong, (0 until 30).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "), "en")
    }
    val planted = (0 until 5).flatMap { k =>
      val toks = (0 until 30).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      Seq((1000L + 2 * k, toks, "en"), (1001L + 2 * k, toks, "en"))
    }
    (base ++ planted).toDF("doc_id", "text", "lang")
  }

  test("generalized simhash at 16 bits reproduces the reference band layout and q47 pairs") {
    assert(Dedup.simhashBandDefs(16, 2) == Seq((0, 0, 0x3FL), (1, 6, 0x1FL), (2, 11, 0x1FL)))
    val viaGeneral = Dedup.simhashNearDupPairs(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"), 16, 2)
      .select("a_id", "b_id", "hamming").collect().map(_.toSeq).toSet
    val viaQuery = Dedup.queries("q47_simhash")(spark, "/root/testdata/sf0.001")
      .select("a_id", "b_id", "hamming").collect().map(_.toSeq).toSet
    assert(viaGeneral == viaQuery)
  }

  test("widening the hash collapses spurious candidates, keeps planted near-dups") {
    val d = corpus.cache()
    graft.functions.expressions.SignatureExprs.register(spark)
    def candidates(bits: Int): Long = {
      val sim = d.select(col("doc_id"), col("lang"),
        expr(s"simhash_bits(split(text, ' '), $bits)").as("simhash"))
      Dedup.simhashCandidates(sim, bits, 2).count()
    }
    val c16 = candidates(16)
    val c48 = candidates(48)
    // 400 docs over a 12-token vocabulary swamp the 2^6-ish 16-bit band
    // buckets; 48-bit bands have 2^16 values and collisions collapse
    assert(c48 * 5 <= c16,
      s"expected >=5x candidate collapse from 16->48 bits, got $c16 -> $c48")
    // every planted pair must survive the wide-hash path end to end
    val pairs48 = Dedup.simhashNearDupPairs(d, 48, 2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { k =>
      assert(pairs48.contains((1000L + 2 * k, 1001L + 2 * k)),
        s"planted pair $k lost at 48 bits")
    }
  }

  test("q178 dial (48 bits, hamming<=1): banded CC equals brute-force union-find") {
    val d = corpus.cache()
    graft.functions.expressions.SignatureExprs.register(spark)
    // brute-force edge set: same-lang all-pairs within hamming 1 over the
    // full 48-bit signatures — what the two 24-bit pigeonhole bands must
    // reproduce exactly (a pair within hamming 1 agrees on >=1 band)
    val sim = d.select(col("doc_id"), col("lang"),
      expr("simhash_bits(split(text, ' '), 48)").as("simhash"))
    // same-lang constraint mirrors the production edge definition — the
    // fixture is single-lang so it is vacuous here, but omitting it would
    // make a future multi-lang fixture fail for a non-banding reason
    val bruteEdges = sim.alias("x").join(sim.alias("y"),
        col("x.lang") === col("y.lang") &&
          col("x.doc_id") < col("y.doc_id") &&
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))) <= 1)
      .select(col("x.doc_id"), col("y.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // driver union-find over doc ids (ids are 0..399 and 1000..1009)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    d.select("doc_id").collect().map(_.getLong(0)).foreach(id => parent(id) = id)
    bruteEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(id => id -> find(id)).toMap
    val got = Dedup.connectedComponents(
      Dedup.simhashNearDupPairs(d, bits = 48, maxHamming = 1)
        .select(col("a_id"), col("b_id")),
      d.select(col("doc_id").as("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      "48-bit h<=1 banded CC diverges from brute-force union-find")
    // the planted verbatim twins (hamming 0) must share a cluster
    (0 until 5).foreach { k =>
      assert(got(1000L + 2 * k) == got(1001L + 2 * k),
        s"planted twin pair $k split at the q178 dial")
    }
  }
}
