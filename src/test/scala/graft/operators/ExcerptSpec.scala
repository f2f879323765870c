package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q159 containment excerpt detection: plain-Scala replay on the real
  * fixture, the planted quote the resemblance family provably misses,
  * the df-cap law (boilerplate generates no pairs), and verdict-flag
  * coherence.
  */
class ExcerptSpec extends SparkSpec {

  private def shingleSet(text: String): Set[String] = {
    val toks = text.split(" ", -1)
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  private def replay(docsSeq: Seq[(Long, String)]): Map[(Long, Long), (Long, Long, Long, Boolean)] = {
    val sh = docsSeq.map { case (id, t) => id -> shingleSet(t) }
      .filter(_._2.nonEmpty)
    val df = sh.flatMap(_._2).groupBy(identity).map { case (s, g) => s -> g.size }
    val rare = sh.map { case (id, s) =>
      id -> s.filter(df(_) <= Dedup.EXC_DF_CAP)
    }.toMap
    val full = sh.toMap
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      if (rare(a) intersect rare(b)).size >= Dedup.EXC_MIN_SHARED
      inter = (sa intersect sb).size.toLong
      na = sa.size.toLong; nb = sb.size.toLong
      if 5 * inter >= 4 * math.min(na, nb)
    } yield (a, b) -> (na, nb, inter,
      2 * inter < na + nb - inter)).toMap
  }

  test("q159 matches the plain-Scala replay (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val docsSeq = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = replay(docsSeq)
    val got = Dedup.queries("q159_excerpt_containment")(spark, dir)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("inter"),
          r.getAs[Boolean]("excerpt"))).toMap
    assert(got == want, s"diverged: got ${got.size} want ${want.size}")
    assert(got.nonEmpty, "fixture must surface contained pairs")
  }

  test("planted quote: containment catches what resemblance LSH cannot") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("excerpt").toString
    val words = (1 to 60).map(i => s"w$i")
    val big = words.mkString(" ")                       // 58 shingles
    val quote = words.slice(20, 33).mkString(" ")       // 11 ⊂ big
    val nearA = words.take(30).mkString(" ")
    val nearB = (words.take(29) :+ "zz").mkString(" ")  // 1-token tail edit
    val boiler = "click here now to subscribe today free"
    val docsSeq = Seq(1L -> big, 2L -> quote, 3L -> nearA, 4L -> nearB) ++
      (100L to 111L).map(_ -> boiler)
    docsSeq.map { case (i, t) => (i, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val d = Tables.load(spark, tmp, "documents")
    val out = graft.CacheScope.run {
      Dedup.queries("q159_excerpt_containment")(spark, tmp)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
          (r.getAs[Double]("containment"), r.getAs[Double]("jaccard"),
            r.getAs[Boolean]("excerpt"))).toMap
    }
    // the quote: containment 1.0, jaccard ≈ 0.19 → excerpt
    val (c12, j12, e12) = out((1L, 2L))
    assert(c12 == 1.0 && j12 < 0.5 && e12, s"quote verdict: ${out((1L, 2L))}")
    // nearA within big is ALSO fully contained (prefix) — but the
    // near-dup pair (3,4) is a resemblance dup, not an excerpt
    val (c34, j34, e34) = out((3L, 4L))
    assert(c34 >= 0.8 && j34 >= 0.5 && !e34, s"near-dup verdict: ${out((3L, 4L))}")
    // df-cap law: the 12 identical boilerplate docs share ONLY shingles
    // with df = 12 > cap — no pair among them may surface (exact dedup
    // q44 owns that class)
    assert(!out.keys.exists { case (a, b) => a >= 100L && b >= 100L },
      s"boilerplate pairs leaked: ${out.keys.filter(_._1 >= 100L)}")
    // and the resemblance kernel misses the quote pair entirely — the
    // reason this modality exists
    val lsh = graft.CacheScope.run {
      Dedup.minhashNearDupPairs(d)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(!lsh.contains((1L, 2L)),
      "minhash LSH unexpectedly caught the low-jaccard quote pair")
  }
}
