package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-curation operators: decontamination, repetition quality,
  * sequence packing. The oracle queries pin exact values against DuckDB;
  * this spec pins the semantic invariants and the plan shapes that matter
  * at scale (broadcast eval side, per-lang windows, no global exchange).
  */
class CorpusOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("decontamination: eval docs excluded, self-overlap detected, broadcast plan") {
    val out = CorpusOps.q68Decontaminate(spark, sf).cache()
    val docs = graft.Tables.load(spark, sf, "documents").cache()
    val evalIds = docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !evalIds.contains(r.getLong(0))), "no eval docs in output")
    // a training doc sharing a verbatim 8-gram with an eval doc must flag:
    // build one by checking any contaminated row really shares a gram
    val flagged = rows.filter(_.getBoolean(2))
    flagged.take(3).foreach { r =>
      val txt = docs.filter(col("doc_id") === r.getLong(0))
        .select("text").first().getString(0).split(" ")
      val trainGrams = txt.sliding(8).map(_.mkString(" ")).toSet
      val anyHit = docs.filter(col("source") === "src0").select("text").collect()
        .exists(er => er.getString(0).split(" ").sliding(8)
          .exists(g => trainGrams.contains(g.mkString(" "))))
      assert(anyHit, s"doc ${r.getLong(0)} flagged without a shared 8-gram")
    }
    // the eval gram table must broadcast (map-side join on the corpus side)
    val plan = CorpusOps.q68Decontaminate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "eval grams must broadcast")
  }

  test("repetition: constructed repeats score correctly") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a b", "en", "srcX", 9L),          // top_tok 4/5, dup bigram "a a" x3 -> 2/4
      (2L, "w x y z", "en", "srcX", 7L),            // all distinct
      (3L, "solo", "en", "srcX", 4L))               // single token, no bigrams
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.q69Repetition(spark, sf) // shape check on real data
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_tok", "top_tok_frac", "dup_bigram_frac", "flagged"))
    // the SAME kernel over constructed inputs (incl. the 1-token edge)
    val r = CorpusOps.repetitionScores(d)
      .select("doc_id", "top_tok_frac", "dup_bigram_frac", "flagged")
      .collect()
      .map(x => x.getLong(0) -> ((x.getDouble(1), x.getDouble(2), x.getBoolean(3))))
      .toMap
    assert(r(1L) == ((0.8, 0.5, true)))
    assert(r(2L) == ((0.25, 0.0, false)))
    assert(r(3L) == ((1.0, 0.0, true)))
  }

  test("packing: offsets tile each lang stream; no global exchange") {
    val out = CorpusOps.q70PackSequences(spark, sf).cache()
    val byLang = out.collect().groupBy(_.getString(1))
    byLang.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getLong(3) == expect, s"$lang doc ${r.getLong(0)} offset")
        assert(r.getLong(4) == r.getLong(3) / 2048, "seq_id derives from offset")
        expect += r.getInt(2)
      }
    }
    // the window must be per-lang (hash partitioned), never a single
    // global sort — the scale guarantee
    val plan = CorpusOps.q70PackSequences(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(lang"), s"per-lang exchange expected:\n$plan")
  }

  test("dataset split: content-keyed (dups co-split), ~90/5/5, shuffle-free") {
    val out = CorpusOps.q80DatasetSplit(spark, sf).cache()
    val rows = out.collect()
    assert(rows.forall { r => val b = r.getLong(2); b >= 0 && b < 100 })
    // exact duplicates land in the SAME split — the no-leakage property
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val splits = out.join(docs, Seq("doc_id"))
      .groupBy("h").agg(countDistinct(col("split")).as("ns"))
    assert(splits.filter(col("ns") > 1).count() == 0L,
      "identical texts must share a split")
    // proportions follow the bucket cut (loose: train dominates, all present)
    val bySplit = rows.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    assert(bySplit.getOrElse("train", 0) > rows.length / 2, s"split sizes: $bySplit")
    // pure per-row projection: no exchange anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must be shuffle-free:\n$plan")
    spark.catalog.clearCache()
  }

  test("dup spans: counts agree with q74's chunking; fractions well-formed; symmetry") {
    val chunks = CorpusOps.q74ChunkDocs(spark, sf)
    val spans = CorpusOps.q99DupSpans(spark, sf)
      .select("doc_id", "n_chunks", "n_dup_chunks", "dup_chunk_frac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // one shared chunk kernel: q99's per-doc chunk counts ARE q74's
    val q74Counts = chunks.groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spans.length == q74Counts.size, "every chunked doc gets a span row")
    spans.foreach { case (id, n, dup, frac) =>
      assert(n == q74Counts(id), s"doc $id: q99 chunk count drifted from q74")
      assert(dup >= 0 && dup <= n && frac >= 0.0 && frac <= 1.0)
      assert(math.abs(frac - math.rint(dup.toDouble / n * 1e6) / 1e6) < 1e-12)
    }
    // symmetry: a duplicated span marks BOTH its docs — the total count of
    // dup chunks can never be 1 for any chunk hash, so if anything is
    // flagged, at least two docs carry flags
    val flagged = spans.count(_._3 > 0)
    assert(flagged != 1, "a cross-doc duplicate span must flag ≥ 2 docs")
  }

  test("ingest pipeline: the four verdicts partition the corpus; stages short-circuit") {
    val out = graft.CacheScope.run {
      CorpusOps.q100IngestPipeline(spark, sf)
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
          r.getBoolean(3), r.getBoolean(4)))
    }
    val corpusN = graft.Tables.load(spark, sf, "documents")
      .filter(col("source") =!= "src0").count()
    assert(out.length == corpusN, "one verdict row per corpus doc")
    // exactly ONE of {quality_flagged, contaminated, is_dup, kept} per doc:
    // flagged docs never reach stage 2 (contaminated=false), eliminated
    // docs never reach stage 3, and a clean doc is keeper XOR dup
    out.foreach { case (id, qf, c, dup, kept) =>
      assert(Seq(qf, c, dup, kept).count(identity) == 1,
        s"doc $id verdicts do not partition: qf=$qf c=$c dup=$dup kept=$kept")
    }
    // stage-1 verdict agrees with q69 (one shared kernel)
    val q69Flagged = CorpusOps.q69Repetition(spark, sf)
      .filter(col("flagged")).select("doc_id").collect().map(_.getLong(0)).toSet
    val corpusIds = out.map(_._1).toSet
    assert(out.filter(_._2).map(_._1).toSet == (q69Flagged & corpusIds),
      "pipeline quality verdict drifted from q69")
    assert(out.count(_._5) > 0, "pipeline must keep something")
  }

  test("shard export: ordinals are a gap-free permutation, shards balanced within 1") {
    val out = CorpusOps.q89ShardExport(spark, sf).cache()
    val n = out.count()
    assert(n == graft.Tables.load(spark, sf, "documents").count())
    // gap-free 0..N-1: min/max/distinct pin the permutation without
    // collecting the corpus
    val agg = out.agg(
      min(col("ordinal")), max(col("ordinal")), countDistinct(col("ordinal"))).head()
    assert(agg.getLong(0) == 0L && agg.getLong(1) == n - 1 && agg.getLong(2) == n,
      s"ordinals not a 0..${n - 1} permutation: $agg")
    // contiguous shards balanced within one row
    val sizes = out.groupBy(col("shard")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until 16).toSet, s"shards present: ${sizes.keySet}")
    assert(sizes.values.max - sizes.values.min <= 1, s"unbalanced: $sizes")
    // the shuffled order is deterministic: a fresh plan reproduces it
    val again = CorpusOps.q89ShardExport(spark, sf)
    assert(out.except(again).count() == 0L && again.except(out).count() == 0L)
    spark.catalog.clearCache()
  }

  test("split leakage: exactly the q46 pairs whose q80 splits differ") {
    // both inputs are independently oracle-gated; the audit must equal
    // their local composition — and exact dups (same text, same content
    // hash, same split by construction) can never appear
    val splits = CorpusOps.q80DatasetSplit(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q46 = Dedup.q46MinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = q46.filter { case (a, b, _) => splits(a) != splits(b) }
      .map { case (a, b, s) => (a, b, splits(a), splits(b), s) }.toSet
    val got = CorpusOps.q102SplitLeakage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4))).toSet
    assert(got == expected, s"leakage audit drifted: got=$got expected=$expected")
    got.foreach { case (_, _, sa, sb, _) => assert(sa != sb) }
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (a, b, _, _, _) =>
      assert(texts(a) != texts(b), s"exact dup ($a,$b) leaked across splits")
    }
    spark.catalog.clearCache()
  }

  test("dedup scrub: first occurrence survives, clean docs round-trip exactly") {
    import org.apache.spark.sql.functions.md5
    val docsDf = graft.Tables.load(spark, sf, "documents").cache()
    val out = CorpusOps.q103DedupScrub(spark, sf).cache()
    assert(out.count() == docsDf.count(), "one row per document")
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val texts = docsDf.select(col("doc_id"), col("text"), md5(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    // local reference: global first-occurrence keep over 64-token blocks
    val blocks = texts.toSeq.sortBy(_._1).flatMap { case (id, (t, _)) =>
      t.split(" ", -1).grouped(64).zipWithIndex.map { case (b, i) =>
        (id, i, b.mkString(" "))
      }
    }
    val seen = scala.collection.mutable.Set.empty[String]
    val kept = blocks.map { case (id, i, b) =>
      (id, i, b, seen.add(b)) // sorted (doc_id, idx) order = global first
    }
    kept.groupBy(_._1).foreach { case (id, bs) =>
      val (nBlocks, nRemoved, scrubMd5) = rows(id)
      assert(nBlocks == bs.length, s"doc $id block count")
      assert(nRemoved == bs.count(!_._4), s"doc $id removed count")
      val expectText = bs.sortBy(_._2).filter(_._4).map(_._3).mkString(" ")
      val expectMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(expectText.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(scrubMd5 == expectMd5, s"doc $id scrubbed text drifted")
      if (nRemoved == 0)
        assert(scrubMd5 == texts(id)._2, s"clean doc $id must round-trip exactly")
    }
    assert(rows.values.exists(_._2 > 0), "fixture dups must trigger removal")
    assert(rows.values.exists(_._2 == 0), "unique docs must survive untouched")
    spark.catalog.clearCache()
  }

  test("oov rate: per-doc coverage against the broadcast q64 vocab") {
    val vocab = TextAnalysis.q64Vocab(spark, sf)
      .collect().map(_.getString(0)).toSet
    val docsDf = graft.Tables.load(spark, sf, "documents").cache()
    val out = TextAnalysis.q101OovRate(spark, sf).cache()
    assert(out.count() == docsDf.count(), "one row per document")
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val texts = docsDf.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      val toks = t.split(" ", -1)
      val (nTok, nOov, rate) = rows(id)
      assert(nTok == toks.length, s"doc $id token count")
      assert(nOov == toks.count(!vocab.contains(_)), s"doc $id oov count")
      assert(rate >= 0.0 && rate <= 1.0 && nOov <= nTok)
    }
    // the 100-row vocab side must broadcast, never shuffle the corpus twice
    val plan = TextAnalysis.q101OovRate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "vocab must broadcast")
    spark.catalog.clearCache()
  }
}
