package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q131 (threshold-sensitivity ladder): cumulative-curve laws, exact
  * agreement with a brute-force all-pairs replay, and the q47 contract
  * at the reference threshold.
  */
class DedupSensitivitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ladder is cumulative and matches brute force at every threshold") {
    val rows = graft.CacheScope.run {
      Dedup.q131DedupSensitivity(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    }
    assert(rows.map(_._1).toSeq ==
      (0L to Dedup.LADDER_MAX_HAMMING.toLong))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3, "curve must be cumulative")
    }
    // brute force: sign every doc once, enumerate all same-lang pairs
    graft.functions.expressions.SignatureExprs.register(spark)
    val sigs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        expr("simhash_bits(split(text, ' '), 16)").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val pairs = for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      if sigs(i)._2 == sigs(j)._2
      hd = java.lang.Long.bitCount(sigs(i)._3 ^ sigs(j)._3)
      if hd <= Dedup.LADDER_MAX_HAMMING
    } yield (sigs(i)._1, sigs(j)._1, hd)
    rows.foreach { case (h, np, ndoc) =>
      val at = pairs.filter(_._3 <= h)
      assert(np == at.size.toLong, s"h=$h pair count drifted from brute force")
      val docs = at.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong
      assert(ndoc == docs, s"h=$h doc count drifted from brute force")
    }
    assert(rows.head._2 > 0, "exact-signature collisions exist at h=0")
    assert(rows.last._2 > rows.head._2, "the ladder is non-degenerate")
  }

  test("the h=2 rung IS q47: same pairs, same affected docs") {
    val rung = graft.CacheScope.run {
      Dedup.q131DedupSensitivity(spark, dir)
        .filter(col("max_hamming") === 2).collect()(0)
    }
    val q47 = graft.CacheScope.run {
      Dedup.q47Simhash(spark, dir)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(rung.getLong(1) == q47.length.toLong)
    assert(rung.getLong(2) ==
      q47.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong)
  }
}
