package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 inverted index + top-k keyword search over `documents` — the
  * retrieval surface of the corpus engine (Robertson et al., TREC-3 1994;
  * the Lucene-style positive idf `ln(1 + (N − df + 0.5)/(df + 0.5))`).
  * Beyond the reference (an LLM-data-pipeline operator): q65's TF-IDF
  * ranks tokens *within* a doc; this ranks *docs against a standing
  * query*, served from a materialized index.
  *
  * Index layout (`writeBm25Index`, invalidate-first/meta-last):
  *  - `postings`  (token, doc_id, tf, dl) — the doc-length norm is
  *    DENORMALIZED into the posting row (the Lucene norm-in-posting
  *    trick), so serving never joins a corpus-sized doclen table;
  *    repartitioned by token and sorted within partitions so a term
  *    predicate prunes row groups via parquet min/max stats.
  *  - `df`     (token, df, cf) — vocab-sized.
  *  - `stats`  one row (n_docs, sum_dl) as EXACT 64-bit sums; `avgdl`
  *    derives at read time by one IEEE division, identical cross-engine.
  *
  * Serving (`q143`): the standing query is the df-ranked token window
  * [RANK_LO, RANK_HI] (mid-high frequency — discriminative but matching
  * many docs), resolved from the STORED df table by a `limit(RANK_HI)`
  * top-k (TakeOrderedAndProject — never a global rank window) + a
  * row_number over that dial-sized frame. Postings are filtered with an
  * `isin` on the collected (≤ 3) terms so the predicate reaches the
  * parquet scan, then each posting row scores in-row and docs aggregate
  * by id. Per-term scores convert to 1e-6-unit 64-bit integers BEFORE
  * the per-doc sum, so the sum is order-independent and the final
  * ranking is engine- and partitioning-exact (the one float that can
  * drift cross-engine, `ln`, moves term·1e6 by ≲ 1e-8 — Bm25Spec pins
  * the measured half-integer margin ≫ that).
  *
  * Scale shape: build is two token-keyed aggregations (map-side
  * partials) over the exploded corpus; serve touches only the matched
  * terms' postings (df-bounded, never the corpus), one doc-keyed
  * aggregate, and a TOP_K TakeOrderedAndProject. The streaming gate
  * scores ARRIVING docs against the frozen terms/stats — stateless,
  * zero corpus work per batch.
  */
object Bm25 {

  /** BM25 dials (interpolated into the oracle so they cannot desync). */
  private[graft] val K1 = 1.2
  private[graft] val B = 0.75

  /** The standing query = tokens at df-rank [LO, HI] (df desc, token
    * asc) — mid-high frequency so BM25's tf/length terms do real work.
    */
  private[graft] val RANK_LO = 10
  private[graft] val RANK_HI = 12
  private[graft] val TOP_K = 10

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** (token, doc_id, tf, dl): tf by (token, doc)-keyed count with
    * map-side partials; dl rides the explode (one value per doc) so the
    * posting row is self-contained at serve time.
    */
  private[graft] def postingsWithNorms(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("token"))
      .groupBy(col("token"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Segmented storage (the q132/StreamingStats convention): each of
    * postings/df/stats holds `seg_<i>` dirs plus at most a newest
    * `compact_<hi>` dir; df and stats rows are MERGE-ABLE PARTIALS
    * (exact 64-bit sums — the q132 rule) finalized at load, and
    * postings need no merging at all because snapshots carry DISJOINT
    * doc_id sets (append-only corpus; updates are a rebuild), so a
    * (token, doc) row exists in exactly one segment.
    *
    * The df subtree is the SINGLE source of truth for segment topology:
    * readers list df/, then read the same segment names under
    * postings/ and stats/ — so a crashed compaction that wrote some
    * compact dirs but not df's is invisible (orphans are never listed),
    * and leftover covered `seg_<i>` dirs are excluded by id.
    */
  private val SegDir = "seg_(\\d+)".r
  private val CompactDir = "compact_(\\d+)".r

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Live segment names from the df subtree: newest compact (if any)
    * plus every seg with id above what it covers.
    */
  private def segmentNames(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/df")
    val f = fs(spark, path)
    if (!f.exists(p)) return Nil
    val names = f.listStatus(p).toSeq.map(_.getPath.getName)
    val compacts = names.collect { case n @ CompactDir(h) => (h.toLong, n) }
    val covered = if (compacts.isEmpty) -1L else compacts.map(_._1).max
    val newest = compacts.sortBy(_._1).lastOption.map(_._2).toSeq
    newest ++ names.collect { case n @ SegDir(i) if i.toLong > covered => n }
  }

  /** Live segment count — the quantity [[maintainBm25]] gates on,
    * exposed for specs and ops dashboards.
    */
  def liveSegmentCount(spark: SparkSession, path: String): Int =
    segmentNames(spark, path).size

  private def nextSegId(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$path/df")
    val f = fs(spark, path)
    if (!f.exists(p)) 0L
    else {
      val ids = f.listStatus(p).toSeq.map(_.getPath.getName).collect {
        case SegDir(i) => i.toLong
        case CompactDir(h) => h.toLong
      }
      if (ids.isEmpty) 0L else ids.max + 1L
    }
  }

  /** One snapshot's contribution, written as segment `name`. df lands
    * LAST — it is the topology root, so the segment becomes visible
    * only when all three tables exist (a crashed write leaves orphans
    * that are never listed).
    */
  private def writeSegment(d: DataFrame, path: String, name: String): Unit = {
    val post = graft.CacheScope.cache(postingsWithNorms(d))
    post.repartition(col("token")).sortWithinPartitions(col("token"))
      .write.mode("overwrite").parquet(s"$path/postings/$name")
    d.select(size(split(col("text"), " ")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl").cast("long")).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats/$name")
    post.groupBy(col("token"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
      .write.mode("overwrite").parquet(s"$path/df/$name")
  }

  /** Materialize postings + df + exact corpus stats. */
  def writeBm25Index(d: DataFrame, path: String): Unit = {
    val spark = d.sparkSession
    IndexMeta.invalidate(spark, path)
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true)
    writeSegment(d, path, "seg_0")
    IndexMeta.write(spark, path, "graft bm25 index",
      "kind" -> "bm25", "k1" -> K1.toString, "b" -> B.toString)
  }

  /** Append a delta snapshot (NEW doc_ids only) at delta-sized cost:
    * one new segment; nothing historical is read or rewritten.
    * Invalidate-first/meta-last makes a crashed append a loud refusal,
    * and the meta rewrite flips the fingerprint so running serving
    * streams restart rather than mix old term stats with new postings.
    */
  def appendBm25Delta(delta: DataFrame, path: String): Unit = {
    val spark = delta.sparkSession
    IndexMeta.read(spark, path, "writeBm25Index") // append extends, never creates
    // ENFORCE the new-doc_ids-only contract instead of documenting it:
    // an overlapping delta silently double-counts df/cf/n_docs/sum_dl
    // and duplicates (token, doc) postings — nothing downstream fails
    // loudly. The check reads one column of the stored postings
    // (dictionary-pruned; maintenance-path cost, the same order the
    // compactor already pays) and refuses BEFORE invalidating the meta,
    // so a rejected append leaves the index serving.
    val dup = spark.read
      .parquet(segmentNames(spark, path).map(n => s"$path/postings/$n"): _*)
      .select(col("doc_id")).distinct()
      .join(delta.select(col("doc_id")).distinct(), Seq("doc_id"))
      .limit(5).collect().map(_.getLong(0))
    require(dup.isEmpty,
      s"appendBm25Delta: delta re-submits stored doc_ids (e.g. ${dup.mkString(", ")}) — " +
        "deltas must carry NEW documents only; updates are a rebuild")
    val name = s"seg_${nextSegId(spark, path)}"
    IndexMeta.invalidate(spark, path)
    writeSegment(delta, path, name)
    IndexMeta.write(spark, path, "graft bm25 index",
      "kind" -> "bm25", "k1" -> K1.toString, "b" -> B.toString)
    // maintenance rides the append: the writer that fragments the index
    // is the one that pays to defragment it, at the measured threshold
    maintainBm25(spark, path)
    ()
  }

  /** Segment count at which the maintenance path compacts, read from
    * `spark.graft.bm25.compactAtSegments` (≤ 0 disables — callers then
    * run [[compactBm25]] on their own schedule). Default 8: the r15
    * wide-vocab bench measured an 8-delta index serving at 2.3× read
    * amplification (0.7 MiB fragmented vs 0.3 MiB compacted per query,
    * engine `bytesRead`) with a 6.1 s one-off compaction restoring the
    * contract — so 8 is where the amortized serve tax provably exceeds
    * the maintenance cost at any corpus size (both sides scale with the
    * same posting volume).
    */
  val COMPACT_AT_SEGMENTS_CONF = "spark.graft.bm25.compactAtSegments"
  val DEFAULT_COMPACT_AT_SEGMENTS = 8

  /** The auto-compaction policy: folds the index iff the live segment
    * count has reached the configured threshold. Returns whether it
    * compacted; the decision is recorded in [[graft.Telemetry]] either
    * way. Called by [[appendBm25Delta]] after every successful append
    * (one-writer contract — the appender IS the maintenance window);
    * also safe to call from any maintenance schedule.
    */
  def maintainBm25(spark: SparkSession, path: String): Boolean = {
    val at = spark.conf.getOption(COMPACT_AT_SEGMENTS_CONF).map(_.toInt)
      .getOrElse(DEFAULT_COMPACT_AT_SEGMENTS)
    val n = segmentNames(spark, path).size
    if (at > 0 && n >= at) {
      graft.Telemetry.record(s"bm25 maintain segments=$n threshold=$at action=compact")
      compactBm25(spark, path)
      true
    } else {
      graft.Telemetry.record(s"bm25 maintain segments=$n threshold=$at action=none")
      false
    }
  }

  /** Fold every live segment into ONE `compact_<hi>` segment and drop
    * the covered dirs — EXACT (integer partials; postings a disjoint
    * union re-sorted by token, restoring row-group pruning across what
    * appends fragmented). Maintenance-only (the one-writer contract);
    * covered-id exclusion makes the deletes non-load-bearing, and the
    * df-last write order makes a crash leave only unlisted orphans.
    */
  def compactBm25(spark: SparkSession, path: String): Unit = {
    val segs = segmentNames(spark, path)
    if (segs.size <= 1) return
    val hi = nextSegId(spark, path) - 1L
    val name = s"compact_$hi"
    IndexMeta.invalidate(spark, path) // running streams must restart
    val post = spark.read.parquet(segs.map(n => s"$path/postings/$n"): _*)
    post.repartition(col("token")).sortWithinPartitions(col("token"))
      .write.mode("overwrite").parquet(s"$path/postings/$name")
    spark.read.parquet(segs.map(n => s"$path/stats/$n"): _*)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats/$name")
    spark.read.parquet(segs.map(n => s"$path/df/$n"): _*)
      .groupBy(col("token"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
      .write.mode("overwrite").parquet(s"$path/df/$name")
    val f = fs(spark, path)
    for (tbl <- Seq("postings", "stats", "df"); n <- segs)
      f.delete(new org.apache.hadoop.fs.Path(s"$path/$tbl/$n"), true)
    IndexMeta.write(spark, path, "graft bm25 index",
      "kind" -> "bm25", "k1" -> K1.toString, "b" -> B.toString)
  }

  /** Load + finalize: df/cf/stats partials fold by exact integer sums,
    * so an appended or compacted index is BIT-IDENTICAL to a
    * from-scratch build (Bm25Spec proves it; q144/q145 share
    * q142/q143's oracles).
    */
  private[graft] def loadBm25Index(spark: SparkSession, path: String)
      : (DataFrame, DataFrame, Long, Long) = {
    IndexMeta.read(spark, path, "writeBm25Index")
    val segs = segmentNames(spark, path)
    val st = spark.read.parquet(segs.map(n => s"$path/stats/$n"): _*)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .collect()(0)
    val dfTable = spark.read.parquet(segs.map(n => s"$path/df/$n"): _*)
      .groupBy(col("token"))
      .agg(sum(col("df")).as("df"), sum(col("cf")).as("cf"))
    (spark.read.parquet(segs.map(n => s"$path/postings/$n"): _*), dfTable,
      st.getAs[Long]("n_docs"), st.getAs[Long]("sum_dl"))
  }

  /** `ln(1 + (N − df + 0.5)/(df + 0.5))` — always positive (Lucene
    * form), textually mirrored in the oracle so both engines evaluate
    * the same IEEE op sequence (only `ln` itself is libm).
    */
  private def idfCol(df: Column, n: Long): Column =
    log(lit(1.0) + (lit(n) - df + lit(0.5)) / (df + lit(0.5)))

  /** Per-posting BM25 term score in 1e-6-unit integers: converting
    * BEFORE the per-doc sum makes the sum exact and order-independent.
    */
  private[graft] def termScoreU(tf: Column, dl: Column, df: Column,
                                n: Long, sumDl: Long): Column = {
    val avgdl = sumDl.toDouble / n
    val w = (tf * lit(K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * dl / lit(avgdl)))
    floor(idfCol(df, n) * w * lit(1e6) + lit(0.5)).cast("long")
  }

  /** The standing query terms from the STORED df table: top-RANK_HI by
    * (df desc, token) via TakeOrderedAndProject, then rank over that
    * dial-sized frame only.
    */
  private[graft] def queryTerms(dfTable: DataFrame): DataFrame =
    dfTable.orderBy(col("df").desc, col("token")).limit(RANK_HI)
      .withColumn("rk",
        row_number().over(Window.orderBy(col("df").desc, col("token"))))
      .filter(col("rk") >= RANK_LO)
      .select(col("token"), col("df"))

  /** Sum matched per-term integer scores per doc. Input needs (doc_id,
    * tf, dl, df) — from stored postings (batch serve) or an arriving
    * batch's own text (streaming gate): ONE definition, no drift.
    */
  private[graft] def scoreMatched(matched: DataFrame, n: Long, sumDl: Long): DataFrame =
    matched
      .withColumn("tu", termScoreU(col("tf"), col("dl"), col("df"), n, sumDl))
      .groupBy(col("doc_id"))
      .agg(sum(col("tu")).as("su"), count(lit(1)).as("n_terms"))

  /** Serve top-k from the loaded index: isin-pruned postings scan →
    * in-row scoring → doc-keyed aggregate → TOP_K TakeOrdered.
    */
  private[graft] def topKAgainstLoaded(post: DataFrame, dfTable: DataFrame,
                                       n: Long, sumDl: Long): DataFrame = {
    val terms = queryTerms(dfTable)
    val toks = terms.collect().map(_.getAs[String]("token")).toSeq // ≤ 3, dial-bounded
    val matched = post.filter(col("token").isin(toks: _*))
      .join(broadcast(terms), Seq("token"))
    scoreMatched(matched, n, sumDl)
      .orderBy(col("su").desc, col("doc_id")).limit(TOP_K)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("su").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"),
        round(col("su") / lit(1e6), 6).as("score"), col("n_terms"))
  }

  /** Serve top-k for a USER-SUPPLIED query — arbitrary terms, not the
    * df-ranked standing window q143 serves. The whole read is
    * term-pruned: df partials fold only for the queried tokens (the
    * `isin` reaches the df parquet scan) and the postings scan carries
    * the same `isin` (row-group min/max on the token-sorted compact
    * segment prunes what appends fragmented), so serve cost scales with
    * the queried terms' postings — never the vocabulary. This is the
    * 10⁸-term contract: the only global reads are the stats partials
    * (segment-count rows). Terms absent from the vocabulary simply
    * match nothing.
    */
  def bm25TopKForTerms(spark: SparkSession, path: String,
                       terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"user query must carry 1..64 terms, got ${terms.size}")
    IndexMeta.read(spark, path, "writeBm25Index")
    val segs = segmentNames(spark, path)
    val st = spark.read.parquet(segs.map(n => s"$path/stats/$n"): _*)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .collect()(0)
    val (n, sumDl) = (st.getAs[Long]("n_docs"), st.getAs[Long]("sum_dl"))
    val dfT = spark.read.parquet(segs.map(s => s"$path/df/$s"): _*)
      .filter(col("token").isin(terms: _*))
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
    val matched = spark.read.parquet(segs.map(s => s"$path/postings/$s"): _*)
      .filter(col("token").isin(terms: _*))
      .join(broadcast(dfT), Seq("token"))
    scoreMatched(matched, n, sumDl)
      .orderBy(col("su").desc, col("doc_id")).limit(TOP_K)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("su").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"),
        round(col("su") / lit(1e6), 6).as("score"), col("n_terms"))
  }

  /** Score an ARRIVING doc batch against frozen terms + corpus stats
    * (tf/dl from the batch's own text) — the streaming gate kernel.
    */
  private[graft] def scoreNewDocs(batch: DataFrame, terms: DataFrame,
                                  n: Long, sumDl: Long): DataFrame = {
    val matched = postingsWithNorms(batch).join(broadcast(terms), Seq("token"))
    scoreMatched(matched, n, sumDl)
      .select(col("doc_id"), round(col("su") / lit(1e6), 6).as("score"),
        col("n_terms"))
  }

  private def ensureIndex(spark: SparkSession, dir: String): String = {
    val path = Tables.derivedIndexPath("graft_bm25_v2", dir, "documents")
    IndexMeta.ensure(spark, path) { writeBm25Index(docs(spark, dir), path) }
    path
  }

  /** Index build audit: the stored vocabulary with df, cf, idf. */
  def q142Bm25Index(spark: SparkSession, dir: String): DataFrame = {
    val (_, dfTable, n, _) = loadBm25Index(spark, ensureIndex(spark, dir))
    dfTable.select(col("token"), col("df"), col("cf"),
      round(idfCol(col("df"), n), 6).as("idf"))
  }

  /** Top-k BM25 search served from the materialized index. */
  def q143Bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val (post, dfTable, n, sumDl) = loadBm25Index(spark, ensureIndex(spark, dir))
    topKAgainstLoaded(post, dfTable, n, sumDl)
  }

  /** The incremental twin: base (doc_id % 5 ≠ 0) built first, the
    * remaining fifth appended as a delta segment. Because q144/q145
    * share q142/q143's FULL-CORPUS oracles, the hash match certifies
    * merge(base, delta) == from-scratch — the q132 merge law applied
    * to a retrieval index.
    */
  private def ensureIncIndex(spark: SparkSession, dir: String): String = {
    val path = Tables.derivedIndexPath("graft_bm25_inc_v2", dir, "documents")
    IndexMeta.ensure(spark, path) {
      val d = docs(spark, dir)
      writeBm25Index(d.filter(pmod(col("doc_id"), lit(5)) =!= 0), path)
      appendBm25Delta(d.filter(pmod(col("doc_id"), lit(5)) === 0), path)
    }
    path
  }

  /** User-supplied-terms retrieval as a gated query (q175): the term set
    * is derived by a deterministic rule — the 3 alphabetically-first
    * distinct tokens of the min-doc_id document — purely so the oracle
    * can name the same terms; the SERVE path is [[bm25TopKForTerms]]
    * verbatim (term-pruned df fold + isin-pruned postings scan), i.e.
    * what an interactive caller with arbitrary terms pays. The term
    * lookup itself is one single-document point read.
    */
  def q175Bm25UserQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureIndex(spark, dir)
    val d0 = docs(spark, dir)
    val minId = d0.agg(min(col("doc_id"))).collect()(0).getLong(0)
    val terms = d0.filter(col("doc_id") === minId)
      .select(explode(split(col("text"), " ")).as("token"))
      .distinct().orderBy(col("token")).limit(3)
      .collect().map(_.getString(0)).toSeq
    bm25TopKForTerms(spark, path, terms)
  }

  /** Vocabulary audit of the APPENDED index — oracle is q142's. */
  def q144Bm25IncIndex(spark: SparkSession, dir: String): DataFrame = {
    val (_, dfTable, n, _) = loadBm25Index(spark, ensureIncIndex(spark, dir))
    dfTable.select(col("token"), col("df"), col("cf"),
      round(idfCol(col("df"), n), 6).as("idf"))
  }

  /** Top-k search over the APPENDED index — oracle is q143's. */
  def q145Bm25IncTopK(spark: SparkSession, dir: String): DataFrame = {
    val (post, dfTable, n, sumDl) = loadBm25Index(spark, ensureIncIndex(spark, dir))
    topKAgainstLoaded(post, dfTable, n, sumDl)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q142_bm25_index" -> q142Bm25Index,
    "q143_bm25_topk" -> q143Bm25TopK,
    "q144_bm25_inc_index" -> q144Bm25IncIndex,
    "q145_bm25_inc_topk" -> q145Bm25IncTopK,
    "q175_bm25_user_query" -> q175Bm25UserQuery)

  def oracleSql: Map[String, String] = {
    val base = baseOracleSql
    // the incremental twins answer the SAME full-corpus questions: one
    // oracle each certifies merge(base, delta) == from-scratch
    base ++ Map(
      "q144_bm25_inc_index" -> base("q142_bm25_index"),
      "q145_bm25_inc_topk" -> base("q143_bm25_topk"),
      // q175: q143's scoring verbatim with the terms CTE swapped for the
      // deterministic user-term rule (3 alphabetically-first distinct
      // tokens of the min-doc_id document)
      "q175_bm25_user_query" -> base("q143_bm25_topk").replace(
        s"""terms AS (
           |  SELECT token, df FROM (
           |    SELECT token, df,
           |      row_number() OVER (ORDER BY df DESC, token) AS rk
           |    FROM dfv)
           |  WHERE rk BETWEEN $RANK_LO AND $RANK_HI),""".stripMargin,
        """terms0 AS (
          |  SELECT DISTINCT unnest(string_split(text, ' ')) AS token
          |  FROM documents
          |  WHERE doc_id = (SELECT min(doc_id) FROM documents)),
          |terms AS (
          |  SELECT t0.token, dfv.df
          |  FROM (SELECT token FROM terms0 ORDER BY token LIMIT 3) t0
          |  JOIN dfv USING (token)),""".stripMargin))
  }.ensuring(m => m("q175_bm25_user_query") != m("q143_bm25_topk"),
    "q175 oracle rewrite did not match q143's terms CTE — needle drifted")

  private def baseOracleSql: Map[String, String] = Map(
    "q142_bm25_index" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |post AS (
        |  SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfv AS (
        |  SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
        |  FROM post GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        |SELECT token, df, cf,
        |  round(ln(1.0 + (s.n - df + 0.5) / (df + 0.5)), 6) AS idf
        |FROM dfv, s""".stripMargin,
    "q143_bm25_topk" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |dl AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
         |  FROM documents),
         |post AS (
         |  SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfv AS (SELECT token, count(*) AS df FROM post GROUP BY 1),
         |s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl
         |  FROM dl),
         |terms AS (
         |  SELECT token, df FROM (
         |    SELECT token, df,
         |      row_number() OVER (ORDER BY df DESC, token) AS rk
         |    FROM dfv)
         |  WHERE rk BETWEEN $RANK_LO AND $RANK_HI),
         |sc AS (
         |  SELECT p.doc_id,
         |    -- w is ONE parenthesized quotient so both engines evaluate
         |    -- idf * (A / B) — the Spark association — not (idf * A) / B
         |    CAST(floor((ln(1.0 + (s.n - t.df + 0.5) / (t.df + 0.5))
         |      * ((p.tf * ($K1 + 1.0))
         |         / (p.tf + $K1 * (1.0 - $B + $B * d.dl
         |            / (CAST(s.sum_dl AS DOUBLE) / s.n))))) * 1e6 + 0.5)
         |      AS BIGINT) AS tu
         |  FROM post p
         |  JOIN terms t USING (token)
         |  JOIN dl d USING (doc_id), s),
         |agg AS (
         |  SELECT doc_id, CAST(sum(tu) AS BIGINT) AS su, count(*) AS n_terms
         |  FROM sc GROUP BY 1)
         |SELECT CAST(row_number() OVER (ORDER BY su DESC, doc_id) AS INT)
         |    AS rank,
         |  doc_id, round(su / 1e6, 6) AS score, n_terms
         |FROM agg ORDER BY su DESC, doc_id LIMIT $TOP_K""".stripMargin)
}
