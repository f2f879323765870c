package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the dedup graph layer: the distributed min-label
  * connected-components loop must agree with a driver-side union-find on
  * arbitrary random graphs (chains, cliques, isolated nodes, forests).
  */
class DedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n.toLong.toInt)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the component minimum
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("q45 prefix filter loses NO true near-dup pair on random corpora") {
    // The PPJoin-family prefix filter claims zero false negatives: any pair
    // with Jaccard >= 0.5 must survive candidate generation. Check against
    // a driver-side all-pairs brute force on randomized corpora engineered
    // to contain near-dups (shared token cores with small mutations).
    val rng = new scala.util.Random(211)
    val vocab = (0 until 40).map(i => s"w$i")
    def doc(core: Seq[String]): String = {
      val mutated = core.map(w => if (rng.nextDouble() < 0.15) vocab(rng.nextInt(40)) else w)
      (mutated ++ Seq.fill(rng.nextInt(3))(vocab(rng.nextInt(40)))).mkString(" ")
    }
    val cores = (0 until 8).map(_ => Seq.fill(12 + rng.nextInt(8))(vocab(rng.nextInt(40))))
    val texts = cores.flatMap(c => (0 until 5).map(_ => doc(c)))
    val rows = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "web", t.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("pfcorpus").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sh = rows.map(r => r._1 -> shingles(r._2)).toMap
    val expected = (for {
      a <- rows; b <- rows if a._1 < b._1
      sa = sh(a._1); sb = sh(b._1)
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.5
    } yield (a._1, b._1)).toSet

    val got = Dedup.q45NgramJaccard(spark, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"prefix filter diverged: missing=${expected -- got}, extra=${got -- expected}")
    assert(expected.nonEmpty, "corpus must actually contain near-dups")

    // the asymmetric index prefix (n − ⌈2n/3⌉ + 1 on the smaller side)
    // must generate no more candidates than the symmetric ~n/2 filter
    def shingleDf = {
      rows.map { case (id, text, lang, source, _) =>
        (id, lang, source, shingles(text).toSeq)
      }.toDF("doc_id", "lang", "source", "shingles")
    }
    val asymCand = Dedup.ngramCandidates(shingleDf).count()
    val symCand = {
      // symmetric reference: both sides keep the full probe prefix
      val byDf = rows.flatMap(r => shingles(r._2).map(s => (s, r._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val prefixes = rows.map { r =>
        val ranked = shingles(r._2).toSeq.sortBy(s => (byDf(s).size, s))
        val n = ranked.size
        r._1 -> ranked.take(n - math.ceil(n * 0.5).toInt + 1).toSet
      }.toMap
      (for {
        a <- rows; b <- rows if a._1 < b._1 && a._3 == b._3 && a._4 == b._4
        if prefixes(a._1).exists(prefixes(b._1).contains)
      } yield 1).size
    }
    info(s"candidates: asymmetric=$asymCand symmetric=$symCand " +
      f"(${100.0 * (symCand - asymCand) / math.max(1, symCand)}%.1f%% fewer)")
    assert(asymCand <= symCand, "index prefix must only shrink the candidate set")
    assert(asymCand >= expected.size, "candidates cover every true pair")
  }

  test("q66 pipeline clusters true clone families (dup recall guard)") {
    // clones at shingle-Jaccard ≥ ~0.85 — the regime a dedup pipeline
    // exists for; with 4×4 minhash banding p(pair) = 1-(1-J^4)^4 ≥ 0.93,
    // and the CC stage closes any pair the banding misses transitively,
    // so full families must land in one cluster
    val rng = new scala.util.Random(431)
    val vocab = (0 until 60).map(i => s"tok$i")
    val families = (0 until 6).map(_ => Seq.fill(30)(vocab(rng.nextInt(60))))
    val texts = families.zipWithIndex.flatMap { case (core, f) =>
      (0 until 4).map { c =>
        // one-token tail mutation keeps J ≥ 28/32 ≈ 0.88
        val tail = if (c == 0) Nil else Seq(vocab(rng.nextInt(60)))
        (f, (core ++ tail).mkString(" "))
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("dupfam").toString
    texts.zipWithIndex.map { case ((f, t), i) =>
      (i.toLong, t, "en", s"fam$f", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val clusters = Dedup.q66DedupPipeline(spark, dir)
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    texts.zipWithIndex.groupBy(_._1._1).foreach { case (fam, members) =>
      val labels = members.map { case (_, i) => clusters(i.toLong) }.distinct
      assert(labels.length == 1, s"family $fam split into clusters $labels")
    }
    // and distinct families must NOT merge
    val famLabels = texts.zipWithIndex.groupBy(_._1._1)
      .map { case (_, ms) => clusters(ms.head._2.toLong) }.toSeq
    assert(famLabels.distinct.length == families.length, "families merged")
  }

  test("minhash similarity estimate tracks true Jaccard (q46 accuracy)") {
    // E[est] = J and sd ≈ sqrt(J(1-J)/16) ≈ 0.12 per pair at 16 slots —
    // the mean absolute error over many near-dup pairs must stay inside
    // a few sd, or the hash family/banding is broken
    val rng = new scala.util.Random(877)
    val vocab = (0 until 50).map(i => s"v$i")
    val cores = (0 until 10).map(_ => Seq.fill(25)(vocab(rng.nextInt(50))))
    val texts = cores.flatMap(c => (0 until 3).map { _ =>
      c.map(w => if (rng.nextDouble() < 0.04) vocab(rng.nextInt(50)) else w).mkString(" ")
    })
    val dir = java.nio.file.Files.createTempDirectory("mhacc").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sh = texts.zipWithIndex.map { case (t, i) => i.toLong -> shingles(t) }.toMap
    val got = Dedup.q46MinhashLsh(spark, dir)
      .select("a_id", "b_id", "est_sim").as[(Long, Long, Double)].collect()
    assert(got.length >= 5, "corpus must produce near-dup pairs")
    val errs = got.map { case (a, b, est) =>
      val (sa, sb) = (sh(a), sh(b))
      val inter = (sa & sb).size.toDouble
      math.abs(est - inter / (sa.size + sb.size - inter))
    }
    val mae = errs.sum / errs.length
    info(f"minhash MAE = $mae%.3f over ${errs.length} pairs")
    assert(mae < 0.15, f"minhash estimate error $mae%.3f too large")
  }

  test("winnowing detects planted shared substrings, misses nothing planted") {
    // pairs of docs sharing an 80-char block at DIFFERENT offsets —
    // content-defined sampling must align the fingerprints anyway
    // (absolute-position sampling could not); filler is unique per doc
    val rng = new scala.util.Random(613)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val blocks = (0 until 5).map(_ => rand(80))
    val texts = blocks.zipWithIndex.flatMap { case (b, i) =>
      Seq((2L * i, rand(30 + rng.nextInt(40)) + " " + b + " " + rand(20)),
        (2L * i + 1, rand(10) + " " + b + " " + rand(50 + rng.nextInt(30))))
    } :+ (100L, rand(200)) // a loner with no planted block
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    texts.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.q78WinnowFingerprint(spark, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    blocks.indices.foreach { i =>
      assert(pairs.contains((2L * i, 2L * i + 1)),
        s"planted pair ${2 * i}/${2 * i + 1} not detected")
    }
    assert(!pairs.exists(p => p._1 == 100L || p._2 == 100L),
      "the loner must not pair with anything")
  }

  test("distributed CC matches union-find on random graphs") {
    val rng = new scala.util.Random(101)
    for (trial <- 1 to 4) {
      val n = 60 + trial * 20
      val m = rng.nextInt(n * 2)
      val edges = (0 until m).map { _ =>
        val a = rng.nextInt(n).toLong
        val b = rng.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val expected = unionFind(n, edges)

      // drive the PRODUCTION loop q58/q66 share
      val edgesDf = edges.toDF("a_id", "b_id")
      val nodesDf = (0 until n).map(_.toLong).toDF("id")
      val got = Dedup.connectedComponents(edgesDf, nodesDf)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: CC labels diverge from union-find")
      // single-partition layout: the whole graph contracts locally and the
      // boundary graph is EMPTY — the two-level degenerate path
      val got1 = Dedup.connectedComponents(edgesDf.repartition(1), nodesDf)
        .as[(Long, Long)].collect().toMap
      assert(got1 == expected, s"trial $trial: single-partition CC diverges")
      // duplicate + mirrored edges must not change components
      val gotDup = Dedup.connectedComponents(
        edgesDf.union(edgesDf).union(edgesDf.select($"b_id", $"a_id")
          .toDF("a_id", "b_id")), nodesDf)
        .as[(Long, Long)].collect().toMap
      assert(gotDup == expected, s"trial $trial: duplicate-edge CC diverges")
      // force the DISTRIBUTED boundary tier (driverMaxEdges = -1): the
      // propagation loop must agree with the driver union-find tiers
      val gotDist = Dedup.connectedComponents(edgesDf, nodesDf, -1L)
        .as[(Long, Long)].collect().toMap
      assert(gotDist == expected, s"trial $trial: distributed-tier CC diverges")
      // mid threshold: too many edges for the direct tier, but the
      // contracted boundary fits — exercises contraction + boundary-UF
      if (edges.nonEmpty) {
        val gotMid = Dedup.connectedComponents(
          edgesDf.repartition(4), nodesDf, edges.length - 1L)
          .as[(Long, Long)].collect().toMap
        assert(gotMid == expected, s"trial $trial: contraction-tier CC diverges")
      }
    }
  }

  test("q79: a delta doc duplicating a corpus doc reports it; fresh docs pass") {
    val rng = new scala.util.Random(331)
    val vocab = (0 until 40).map(i => s"w$i")
    def freshText() = Seq.fill(40)(vocab(rng.nextInt(40))).mkString(" ")
    // corpus = non-multiples of 10; delta = multiples of 10
    val corpus = (1L to 19L).filter(_ % 10 != 0).map(i => (i, freshText()))
    val copied = corpus.find(_._1 == 3L).get._2
    val rows = (corpus ++ Seq(
      (0L, copied),      // delta: exact copy of corpus doc 3
      (10L, freshText()) // delta: genuinely new
    )).map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("incdedup").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.q79IncrementalDedup(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(3))).toMap
    assert(got(0L) == (Some(3L), true), s"exact copy must report dup_of=3: $got")
    assert(got(10L)._2 == false, s"fresh delta doc must not be a dup: $got")
    assert(got.keySet == Set(0L, 10L), "every delta doc gets exactly one row")
  }

  test("shingle queries survive sub-3-token docs (oracle's empty-range semantics)") {
    // sequence(1, size-2) on a 2-token doc is the DESCENDING [1, 0] and
    // element_at(tok, 0) throws — the >= 3 filter must mirror DuckDB's
    // empty generate_series instead: short docs simply have no shingles,
    // so they never pair and an incremental-delta short doc is not a dup
    val rng = new scala.util.Random(47)
    val vocab = (0 until 30).map(i => s"w$i")
    def freshText() = Seq.fill(30)(vocab(rng.nextInt(30))).mkString(" ")
    val rows = (Seq(
      (0L, "hi"),            // delta, 1 token
      (1L, "two tokens"),    // corpus, 2 tokens
      (2L, ""),              // corpus, empty text
      (10L, "also two")      // delta, 2 tokens
    ) ++ (3L to 7L).map(i => (i, freshText())))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("shortdocs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // none of these may throw, and short docs never appear in pair output
    val p45 = Dedup.q45NgramJaccard(spark, dir).collect()
    val p46 = Dedup.q46MinhashLsh(spark, dir).collect()
    val short = Set(0L, 1L, 2L, 10L)
    assert(!(p45 ++ p46).exists(r => short(r.getLong(0)) || short(r.getLong(1))))
    val inc = Dedup.q79IncrementalDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(inc.keySet == Set(0L, 10L) && inc.values.forall(_ == false),
      s"short delta docs must report not-dup: $inc")
  }

  test("q79 via a prebuilt band index matches the inline rebuild exactly") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
    val idx = java.nio.file.Files.createTempDirectory("bandidx").toString
    // index the corpus side (non-multiples of 10), run the delta against it
    Dedup.writeBandIndex(docs.filter($"doc_id" % 10 =!= 0), idx)
    val viaIndex = Dedup.incrementalDedupAgainstIndex(
      docs.filter($"doc_id" % 10 === 0), idx)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(3))).toSet
    val inline = Dedup.q79IncrementalDedup(spark, dir)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(3))).toSet
    assert(viaIndex == inline, "index path must reproduce the inline q79 result")
    assert(inline.exists(_._3), "fixture should contain at least one delta dup")
  }

  test("a wide-dial index records (k, bands) and the delta reader honors them") {
    // corpus doc + a verbatim delta copy: an index built at k=64/bands=16
    // must catch it, and the reader must pick the dials up from the stored
    // metadata (signing the delta at a guessed 16 would zero the join)
    val corpus = Seq(
      (100L, "one two three four five six seven eight nine ten"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "completely novel content with no corpus counterpart here"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("bandidx64").toString
    Dedup.writeBandIndex(corpus, idx, k = 64, bands = 16)
    val out = Dedup.incrementalDedupAgainstIndex(delta, idx)
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), r.getBoolean(3)))).toMap
    assert(out(1L) == ((Some(100L), true)), s"verbatim copy must flag dup: $out")
    assert(!out(2L)._2, s"novel doc must pass: $out")
  }

  test("CC on an empty graph returns empty (no driver-side aggregate to NPE)") {
    val edgesDf = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val nodesDf = Seq.empty[Long].toDF("id")
    assert(Dedup.connectedComponents(edgesDf, nodesDf).count() == 0L)
  }

  test("CC collapses a 200-node chain to one component (pointer-jump path)") {
    val n = 200
    val edgesDf = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("a_id", "b_id")
    val nodesDf = (0 until n).map(_.toLong).toDF("id")
    // distributed tier forced: the chain is the pointer-jumping worst case
    val labels = Dedup.connectedComponents(edgesDf, nodesDf, -1L)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == n && labels.values.forall(_ == 0L),
      "chain must collapse to the min-id component label")
  }

  test("q66 stage probe emits one telemetry event per pipeline stage") {
    // the probe is Bench's regression-attribution instrument — if a stage
    // is renamed or dropped the bench artifact silently loses its
    // diagnostic value, so pin the contract here
    graft.Telemetry.drain()
    Dedup.q66StageProbe(spark, "/root/testdata/sf0.001")
    val evs = graft.Telemetry.drain()
    val stages = Seq("shingle", "minhash", "band_join", "verify", "cc")
    stages.foreach { s =>
      assert(evs.exists(e => e.startsWith(s"q66probe stage=$s ") &&
        e.contains(" secs=") && e.contains(" rows=")),
        s"missing stage=$s in: $evs")
    }
  }
}
