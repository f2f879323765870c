package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q120 (padding-efficiency audit) and q121 (cross-source mirror matrix):
  * the oracles pin exact values; this spec pins the conservation laws and
  * the planted-case directions each audit exists to surface.
  */
class CorpusAuditSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q120: token conservation, bucket law, waste bounds") {
    val rows = CorpusOps.q120PaddingAudit(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, nd, real, padded, waste) =>
      assert(b % 64 == 0 && b > 0, s"bucket $b not a 64 multiple")
      assert(padded == b * nd, s"bucket $b padded tokens wrong")
      assert(real <= padded && real > (b - 64) * nd,
        s"bucket $b real tokens $real outside ((b-64)·n, b·n]")
      assert(waste >= 0.0 && waste < 1.0, s"bucket $b waste $waste")
    }
    val total = graft.Tables.load(spark, dir, "documents")
      .select(sum(size(split(col("text"), " ")).cast("long"))).head().getLong(0)
    assert(rows.map(_._3).sum == total, "real tokens not conserved across buckets")
  }

  test("q120 constructed: lengths 1/64/65 land in buckets 64/64/128") {
    val tmp = java.nio.file.Files.createTempDirectory("pad").toString
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    Seq((1L, txt(1), "en", "s", 1L), (2L, txt(64), "en", "s", 1L),
      (3L, txt(65), "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.q120PaddingAudit(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out(64L) == ((2L, 65L, 128L, 0.492188)), s"bucket 64: ${out.get(64L)}")
    assert(out(128L) == ((1L, 65L, 128L, 0.492188)), s"bucket 128: ${out.get(128L)}")
  }

  test("q122: cells partition the raw corpus; planted docs land in their cells") {
    // conservation on the fixture
    val cells = CorpusOps.q122FilterAblation(spark, dir)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) -> r.getLong(3))
    assert(cells.map(_._1).distinct.length == cells.length, "duplicate cells")
    val nRaw = graft.Tables.load(spark, dir, "documents")
      .filter(col("source") =!= "src0").count()
    assert(cells.map(_._2).sum == nRaw, "cells do not partition the raw corpus")

    // planted fixture: one doc per gate plus an overlap and a dup pair
    val tmp = java.nio.file.Files.createTempDirectory("ablate").toString
    val docs = Seq(
      (0L, "e1 e2 e3 e4 e5 e6", "en", "src0", 1L),
      (1L, (1 to 10).map("c" + _).mkString(" "), "en", "s", 1L),  // clean
      (2L, "spam spam spam spam", "en", "s", 1L),                 // quality only
      (3L, "e1 e2 e3 e4 e5 " + (1 to 6).map("f" + _).mkString(" "),
        "en", "s", 1L),                                           // contaminated only
      (4L, (1 to 10).map("u" + _).mkString(" "), "en", "s", 1L),  // dup keeper
      (5L, (1 to 10).map("u" + _).mkString(" "), "en", "s", 1L),  // dup copy
      (6L, "e1 e2 e3 e4 e5 x x x x x x x", "en", "s", 1L))        // quality+cont
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.q122FilterAblation(spark, tmp)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)) -> r.getLong(3))
      .toMap
    assert(out == Map(
      (false, false, false) -> 2L, // clean + dup keeper
      (true, false, false) -> 1L,
      (false, true, false) -> 1L,
      (false, false, true) -> 1L,
      (true, true, false) -> 1L), s"cells: $out")
  }

  test("q123: gap-free curriculum — deciles non-increasing along the ordinal") {
    val rows = graft.CacheScope.run {
      CorpusOps.q123CurriculumOrder(spark, dir)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    }
    assert(rows.nonEmpty)
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (0L until n).toSeq,
      "curriculum ordinals are not a gap-free permutation")
    // easy-to-hard: quality decile never increases as the ordinal grows
    val byOrd = rows.sortBy(_._3).map(_._2).toSeq
    byOrd.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, s"curriculum order regressed: $a before $b")
      case _ =>
    }
    // contiguous balanced shards, later shards strictly-lower-or-equal band
    val shards = rows.groupBy(_._4)
    val sizes = shards.map(_._2.length)
    assert(sizes.max - sizes.min <= 1, s"shard sizes: $sizes")
    val bands = shards.toSeq.sortBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).max, v.map(_._2).min) }
    bands.sliding(2).foreach {
      case Seq((_, _, minA), (_, maxB, _)) =>
        assert(minA >= maxB, "a later shard holds an easier doc than an earlier one")
      case _ =>
    }
    // decile really is q88's
    val q88 = TextAnalysis.q88QualityDeciles(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    rows.foreach { case (id, d, _, _) =>
      assert(d == q88(id), s"doc $id decile drifted from q88")
    }
  }

  test("q121: every q46 pair lands in exactly one unordered source cell") {
    val m = Dedup.q121MirrorMatrix(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val totalPairs = Dedup.queries("q46_minhash_lsh")(spark, dir).count()
    if (totalPairs > 0) {
      assert(m.map(_._3).sum == totalPairs, "pair count not conserved")
      m.foreach { case (a, b, n, sim) =>
        assert(a <= b, s"cell ($a, $b) not canonically ordered")
        assert(n > 0 && sim >= 0.5, s"cell ($a, $b) mean_sim $sim below threshold")
      }
    } else assert(m.isEmpty)
  }

  test("q121 constructed: a mirror source lights up the off-diagonal cell") {
    val tmp = java.nio.file.Files.createTempDirectory("mirror").toString
    val story = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs =
      // srcP publishes; srcM mirrors it verbatim; srcX is unrelated
      (1L to 5L).map(i => (i, story + s" extra$i", "en", "srcP", 1L)) ++
        (11L to 15L).map(i => (i, story + s" extra${i - 10}", "en", "srcM", 1L)) ++
        (21L to 25L).map(i =>
          (i, (1 to 30).map(j => s"other${i}_$j").mkString(" "), "en", "srcX", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = Dedup.q121MirrorMatrix(spark, tmp)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m.getOrElse(("srcM", "srcP"), 0L) >= 5L,
      s"mirror cell missing or thin: $m")
    assert(!m.keys.exists { case (a, b) => a == "srcX" || b == "srcX" },
      s"unrelated source entangled: $m")
  }
}
