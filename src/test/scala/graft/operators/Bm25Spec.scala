package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** BM25 retrieval: independent Scala replay of the whole chain (df →
  * term ranks → integer-unit scores → top-k), the ln-rounding margin
  * guard, and the stored-postings vs recomputed-batch round-trip.
  */
class Bm25Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Plain-Scala BM25 over the corpus — no Spark, no SQL: tokenize with
    * the same keep-empty split semantics, recompute df/stats/term
    * ranks/integer scores with the spec's own loops.
    */
  private lazy val brute: (Map[String, Long], Seq[(Int, Long, Double, Long)], Seq[Double], Seq[Double]) = {
    val rows = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val toks = rows.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = rows.length.toLong
    val sumDl = toks.values.map(_.size.toLong).sum
    val avgdl = sumDl.toDouble / n
    val tf: Map[(String, Long), Long] = rows.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, g) => (w, id) -> g.length.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._1).map { case (w, g) => w -> g.size.toLong }
    def idf(d: Long) = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
    val ranked = df.toSeq.sortBy { case (w, d) => (-d, w) }
    val terms = ranked.slice(Bm25.RANK_LO - 1, Bm25.RANK_HI).map(_._1)
    def termScore(w: String, id: Long): Double = {
      val t = tf((w, id)); val dl = toks(id).size
      idf(df(w)) * ((t * (Bm25.K1 + 1.0)) /
        (t + Bm25.K1 * (1.0 - Bm25.B + Bm25.B * dl / avgdl)))
    }
    val matched = for {
      w <- terms; id <- rows.map(_._1) if tf.contains((w, id))
    } yield (id, termScore(w, id))
    val perDoc = matched.groupBy(_._1).map { case (id, g) =>
      (id, g.map { case (_, s) => math.floor(s * 1e6 + 0.5).toLong }.sum,
        g.size.toLong)
    }.toSeq
    val top = perDoc.sortBy { case (id, su, _) => (-su, id) }.take(Bm25.TOP_K)
      .zipWithIndex.map { case ((id, su, nt), i) =>
        // round(su/1e6, 6) is the identity on su/1e6: the quotient's
        // shortest decimal form already has ≤ 6 fractional digits
        (i + 1, id, su / 1e6, nt)
      }
    val termMargins = matched.map { case (_, s) =>
      val x = s * 1e6; math.abs(x - math.floor(x) - 0.5)
    }
    val idfMargins = df.values.map { d =>
      val x = idf(d) * 1e6; math.abs(x - math.floor(x) - 0.5)
    }.toSeq
    (df, top, termMargins, idfMargins)
  }

  test("q142/q143 match the plain-Scala replay end to end") {
    val (bDf, bTop, _, _) = brute
    val idx = Bm25.queries("q142_bm25_index")(spark, dir).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("df")).toMap
    assert(idx == bDf, "stored df table diverged from the replay")
    val got = Bm25.queries("q143_bm25_topk")(spark, dir).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Long]("n_terms"))).toSeq
    assert(got == bTop, s"top-k diverged:\n got $got\nwant $bTop")
  }

  test("integer-unit scores sit far from their rounding boundaries") {
    val (_, _, termMargins, idfMargins) = brute
    // a cross-engine ln ulp moves term·1e6 by ≈ |x|·1e-16 ≲ 1e-8; the
    // measured half-integer margins must dwarf that for the hash match
    // to be robust (the DsirUnimaxSpec discipline)
    assert(termMargins.nonEmpty && termMargins.min > 1e-4,
      s"term-score margin too thin: ${termMargins.min}")
    assert(idfMargins.min > 1e-4, s"idf margin too thin: ${idfMargins.min}")
  }

  test("delta append merges bit-identically to a from-scratch build") {
    val d = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("bm25inc").toString
    Bm25.writeBm25Index(d, s"$tmp/full")
    Bm25.writeBm25Index(d.filter(pmod(col("doc_id"), lit(5)) =!= 0), s"$tmp/inc")
    Bm25.appendBm25Delta(d.filter(pmod(col("doc_id"), lit(5)) === 0), s"$tmp/inc")
    val (postF, dfF, nF, sF) = Bm25.loadBm25Index(spark, s"$tmp/full")
    val (postI, dfI, nI, sI) = Bm25.loadBm25Index(spark, s"$tmp/inc")
    assert((nF, sF) == (nI, sI), "corpus stats diverged after append")
    assert(dfF.collect().map(_.toSeq).toSet == dfI.collect().map(_.toSeq).toSet,
      "finalized df table diverged after append")
    assert(postF.collect().map(_.toSeq).toSet == postI.collect().map(_.toSeq).toSet,
      "postings diverged after append")
    val topF = Bm25.topKAgainstLoaded(postF, dfF, nF, sF).collect().map(_.toSeq)
    val topI = Bm25.topKAgainstLoaded(postI, dfI, nI, sI).collect().map(_.toSeq)
    assert(topF.sameElements(topI), "served top-k diverged after append")
  }

  test("auto-compaction fires at the segment threshold, under the no-marker committer") {
    // the policy must behave on a cluster whose committer writes no
    // _SUCCESS markers (the StatsMaintenanceSpec discipline) — segment
    // listing and the compact sweep key off the df-last write order,
    // never the marker
    val d = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("bm25auto").toString
    val prevMark = spark.conf.getOption("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs")
    spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    spark.conf.set(Bm25.COMPACT_AT_SEGMENTS_CONF, "3")
    try {
      graft.Telemetry.drain()
      Bm25.writeBm25Index(d.filter(pmod(col("doc_id"), lit(3)) === 0), s"$tmp/inc")
      Bm25.appendBm25Delta(d.filter(pmod(col("doc_id"), lit(3)) === 1), s"$tmp/inc")
      // 2 segments < 3: the policy must have declined
      val after2 = graft.Telemetry.drain()
      assert(after2.exists(e => e.contains("bm25 maintain segments=2") && e.contains("action=none")),
        s"policy must decline below threshold: $after2")
      Bm25.appendBm25Delta(d.filter(pmod(col("doc_id"), lit(3)) === 2), s"$tmp/inc")
      val after3 = graft.Telemetry.drain()
      assert(after3.exists(e => e.contains("bm25 maintain segments=3") && e.contains("action=compact")),
        s"policy must compact at threshold: $after3")
      // the folded index serves bit-identically to a from-scratch build
      Bm25.writeBm25Index(d, s"$tmp/full")
      val (postF, dfF, nF, sF) = Bm25.loadBm25Index(spark, s"$tmp/full")
      val (postI, dfI, nI, sI) = Bm25.loadBm25Index(spark, s"$tmp/inc")
      assert((nF, sF) == (nI, sI), "corpus stats diverged after auto-compaction")
      val topF = Bm25.topKAgainstLoaded(postF, dfF, nF, sF).collect().map(_.toSeq)
      val topI = Bm25.topKAgainstLoaded(postI, dfI, nI, sI).collect().map(_.toSeq)
      assert(topF.sameElements(topI), "served top-k diverged after auto-compaction")
      // and the fold is physical: one live segment remains
      assert(Bm25.liveSegmentCount(spark, s"$tmp/inc") == 1,
        "auto-compaction must fold to one live segment")
    } finally {
      spark.conf.unset(Bm25.COMPACT_AT_SEGMENTS_CONF)
      prevMark match {
        case Some(v) => spark.conf.set("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", v)
        case None => spark.conf.unset("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs")
      }
    }
  }

  test("compaction folds segments exactly; covered leftovers are excluded; appends continue") {
    val d = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("bm25cmp").toString
    val idx = s"$tmp/idx"
    Bm25.writeBm25Index(d.filter(pmod(col("doc_id"), lit(3)) === 0), idx)
    Bm25.appendBm25Delta(d.filter(pmod(col("doc_id"), lit(3)) === 1), idx)
    Bm25.appendBm25Delta(d.filter(pmod(col("doc_id"), lit(3)) === 2), idx)
    def snap() = {
      val (post, dfT, n, s) = Bm25.loadBm25Index(spark, idx)
      (post.collect().map(_.toSeq).toSet, dfT.collect().map(_.toSeq).toSet,
        n, s,
        Bm25.topKAgainstLoaded(post, dfT, n, s).collect().map(_.toSeq).toSeq)
    }
    val before = snap()
    Bm25.compactBm25(spark, idx)
    val after = snap()
    assert(before == after, "compaction changed what the index serves")
    val segs = new java.io.File(s"$idx/df").listFiles().map(_.getName)
      .filter(n => n.startsWith("seg_") || n.startsWith("compact_"))
    assert(segs.toSeq == Seq("compact_2"),
      s"expected one compacted segment, found ${segs.toSeq}")
    // a crashed delete leaves a covered seg dir behind: its id ≤ hi, so
    // readers must exclude it even though it holds duplicate partials
    val (_, dfT, _, _) = Bm25.loadBm25Index(spark, idx)
    dfT.limit(5).write.mode("overwrite").parquet(s"$idx/df/seg_1")
    assert(snap() == after, "a covered leftover segment leaked into the read")
    // and the lifecycle continues: post-compaction appends get fresh ids
    Bm25.appendBm25Delta(d.limit(0), idx)
    assert(new java.io.File(s"$idx/df/seg_3").exists(),
      "post-compaction append did not take the next segment id")
    assert(snap()._3 == after._3, "empty post-compaction append changed n_docs")
  }

  test("empty delta append is the identity; append to a missing index refuses") {
    val d = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("bm25incid").toString
    Bm25.writeBm25Index(d, s"$tmp/idx")
    val before = Bm25.loadBm25Index(spark, s"$tmp/idx")
    Bm25.appendBm25Delta(d.filter(lit(false)), s"$tmp/idx")
    val after = Bm25.loadBm25Index(spark, s"$tmp/idx")
    assert((before._3, before._4) == (after._3, after._4))
    assert(before._2.collect().map(_.toSeq).toSet ==
      after._2.collect().map(_.toSeq).toSet, "empty delta changed the vocab")
    intercept[IllegalStateException] {
      Bm25.appendBm25Delta(d.limit(1), s"$tmp/never_built")
    }
  }

  test("overlapping delta is refused loudly and leaves the index serving") {
    val d = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("bm25ovl").toString
    Bm25.writeBm25Index(d.filter(pmod(col("doc_id"), lit(2)) === 0), s"$tmp/idx")
    val before = Bm25.loadBm25Index(spark, s"$tmp/idx")
    val beforeDf = before._2.collect().map(_.toSeq).toSet
    // the whole corpus re-submits every stored doc_id — the silent
    // failure mode is double-counted df/cf/n_docs and duplicate postings
    val e = intercept[IllegalArgumentException] {
      Bm25.appendBm25Delta(d, s"$tmp/idx")
    }
    assert(e.getMessage.contains("NEW documents"), e.getMessage)
    // refusal happened BEFORE meta invalidation: the index still serves
    val after = Bm25.loadBm25Index(spark, s"$tmp/idx")
    assert((before._3, before._4) == (after._3, after._4),
      "refused append changed corpus stats")
    assert(after._2.collect().map(_.toSeq).toSet == beforeDf,
      "refused append changed the df table")
    // and a genuinely-new delta still goes through afterwards
    Bm25.appendBm25Delta(d.filter(pmod(col("doc_id"), lit(2)) === 1), s"$tmp/idx")
    val grown = Bm25.loadBm25Index(spark, s"$tmp/idx")
    assert(grown._3 == d.count(), "post-refusal append lost documents")
  }

  test("serve from stored postings equals scoring recomputed from text") {
    val d = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("bm25rt").toString
    Bm25.writeBm25Index(d, s"$tmp/index")
    val (post, dfT, n, sumDl) = Bm25.loadBm25Index(spark, s"$tmp/index")
    val terms = Bm25.queryTerms(dfT)
    val fromStore = Bm25.scoreMatched(
        post.join(broadcast(terms), Seq("token")), n, sumDl)
      .collect().map(_.toSeq).toSet
    val fromText = Bm25.scoreMatched(
        Bm25.postingsWithNorms(d.select(col("doc_id"), col("text")))
          .join(broadcast(terms), Seq("token")), n, sumDl)
      .collect().map(_.toSeq).toSet
    assert(fromStore == fromText,
      "stored postings and recomputed text scoring diverged")
  }

  test("user-supplied terms: term-pruned serve equals a from-text recompute; scans are pruned") {
    val d = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("bm25usr").toString
    Bm25.writeBm25Index(d, s"$tmp/index")
    val (_, dfT, n, sumDl) = Bm25.loadBm25Index(spark, s"$tmp/index")
    // two real vocabulary terms + one absent term (matches nothing)
    val real = dfT.orderBy(col("df").asc, col("token")).limit(2)
      .collect().map(_.getString(0)).toSeq
    val terms = real :+ "zz_not_in_vocab"
    val served = Bm25.bm25TopKForTerms(spark, s"$tmp/index", terms)
    // plan contract: both the postings and df scans carry the token
    // pushdown — the read scales with the queried terms, not the vocab
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(token"),
      "token isin must reach the parquet scans:\n" + plan)
    val got = served.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Long]("n_terms"))).toSet
    // reference: score the same terms from raw text with df recomputed
    val refDf = dfT.filter(col("token").isin(terms: _*))
    val want = Bm25.scoreMatched(
        Bm25.postingsWithNorms(d.select(col("doc_id"), col("text")))
          .join(broadcast(refDf), Seq("token")), n, sumDl)
      .orderBy(col("su").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        BigDecimal(r.getAs[Long]("su") / 1e6)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        r.getAs[Long]("n_terms"))).toSet
    assert(got == want, s"user-query serve drifted: got $got want $want")
    // the absent term changed nothing; the 2 real rare terms bound n_terms
    assert(got.forall(_._3 <= 2))
    intercept[IllegalArgumentException] {
      Bm25.bm25TopKForTerms(spark, s"$tmp/index", Nil)
    }
  }

  test("compaction preserves the user-term serve AND its pushdown pruning") {
    import org.apache.spark.sql.functions.col
    val d = Tables.load(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("bm25cmp").toString
    val idx = s"$tmp/index"
    // fragmented state: base + delta = two segments
    Bm25.writeBm25Index(d.filter(col("doc_id") % 2 === 0), idx)
    Bm25.appendBm25Delta(d.filter(col("doc_id") % 2 === 1), idx)
    val (_, dfT, _, _) = Bm25.loadBm25Index(spark, idx)
    val terms = dfT.orderBy(col("df").asc, col("token")).limit(3)
      .collect().map(_.getString(0)).toSeq
    def serve() = Bm25.bm25TopKForTerms(spark, idx, terms)
    val before = serve().collect().map(_.toSeq).toSeq
    Bm25.compactBm25(spark, idx)
    val served = serve()
    // the compacted (token-sorted) segment must still take the isin at
    // the scan — compaction exists to RESTORE row-group pruning, so a
    // lost PushedFilters here defeats its purpose at 10^8 terms
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(token"),
      "compacted postings scan lost the token pushdown:\n" + plan)
    assert(served.collect().map(_.toSeq).toSeq == before,
      "compaction moved the user-term serve")
  }
}
