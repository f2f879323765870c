package graft.operators

import graft.SparkSpec

/** The occupancy-derived PQ code-resolution dial
  * ([[Similarity.derivedPqM]]): writeIvfPqIndex's default m now comes
  * from the measured law — m=8 holds at the hash-verified fixture
  * occupancy (125 docs/list) and each doubling of m buys one 10×
  * occupancy rung (the r15/r16 ladder measurements) — with explicit
  * dials always overriding, and the decision recorded in IndexMeta so
  * an index is auditable about WHY it carries its resolution.
  */
class PqAutoDialSpec extends SparkSpec {
  import spark.implicits._

  test("derivedPqM follows the measured law at planted occupancies") {
    // the fixture anchor: 2000 vectors / 16 lists = 125 docs/list → m=8
    assert(Similarity.derivedPqM(2000, 16, 64) == 8)
    // one decade over base → one doubling
    assert(Similarity.derivedPqM(20000, 16, 64) == 16)
    // two decades → two doublings
    assert(Similarity.derivedPqM(200000, 16, 64) == 32)
    // the measured 5M/√N rung: occupancy ≈ 2235 ≈ 1.25 decades → m=32,
    // exactly the dial SCALE.md measured 0.967 residual recall at
    assert(Similarity.derivedPqM(5000000L, 2237, 64) == 32)
  }

  test("derived m clamps to the embedding dim and its divisors") {
    // wants 8·2^5 = 256 but dim=16 caps it
    assert(Similarity.derivedPqM(2000000L, 1, 16) == 16)
    // wants 32 but 48 % 32 != 0 → halve to 16
    assert(Similarity.derivedPqM(200000, 16, 48) == 16)
  }

  test("writeIvfPqIndex records the m decision; explicit dials override") {
    val tmp = java.nio.file.Files.createTempDirectory("pq_auto").toString
    def vf(xs: Double*) = xs.map(_.toFloat)
    val corpus = (0L until 24L).map { i =>
      val base = if (i % 2 == 0) vf(1.0, 0.1, 0.0, 0.0, 0.2, 0.0, 0.0, 0.0)
                 else vf(0.0, 0.1, 1.0, 0.0, 0.0, 0.2, 0.0, 0.0)
      (i, base.updated(1, (0.1 + i * 0.01).toFloat))
    }.toDF("vec_id", "embedding")

    Similarity.writeIvfPqIndex(corpus, s"$tmp/auto")
    val metaAuto = IndexMeta.read(spark, s"$tmp/auto", "writeIvfPqIndex")
    assert(metaAuto.getProperty("m") == "8",
      "24 vectors / 16 lists sits at the anchor occupancy — auto m must be 8")
    assert(metaAuto.getProperty("m_decision").startsWith("auto("),
      s"auto decision must be recorded: ${metaAuto.getProperty("m_decision")}")

    Similarity.writeIvfPqIndex(corpus, s"$tmp/explicit", m = Similarity.PQ_M)
    val metaEx = IndexMeta.read(spark, s"$tmp/explicit", "writeIvfPqIndex")
    assert(metaEx.getProperty("m") == "8")
    assert(metaEx.getProperty("m_decision") == "explicit")
  }
}
