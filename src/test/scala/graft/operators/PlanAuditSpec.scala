package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression guard: the plan shapes that make these
  * operators scale must survive refactors — broadcasts stay broadcasts,
  * pushdown reaches the scan, top-k compiles to TakeOrdered, partial
  * aggregation stays map-side.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q03: dimension joins broadcast, no shuffle join on the fact side") {
    val p = plan(Relational.queries("q03_join_broadcast")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ:\n" + p)
  }

  test("q02: predicates and projection reach the parquet scan") {
    val p = plan(Relational.queries("q02_filter_project")(spark, dir))
    assert(p.split('\n').exists(l =>
      l.contains("PushedFilters") && !l.contains("PushedFilters: []")), p)
    assert(!p.contains("p_comment"), "unprojected column read:\n" + p)
  }

  test("q08: top-k compiles to TakeOrderedAndProject") {
    val p = plan(Relational.queries("q08_topk")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q44/q57: q44 keeps map-side partial agg; q57 assignment is a pure map") {
    assert(plan(Dedup.queries("q44_dedup_exact")(spark, dir)).contains("partial"))
    // the trained centroids ride the UDF closure, so list assignment must
    // stay a PURE MAP: no corpus × centroid join of any kind may reappear
    // (the pre-r7 shape was a crossJoin + max_by aggregate — N·k rows
    // through an exchange instead of zero)
    val p57 = plan(Similarity.queries("q57_ann_ivf")(spark, dir))
    assert(!p57.contains("Cartesian") && !p57.contains("BroadcastNestedLoop"),
      "IVF assignment regressed to a corpus × centroid join:\n" + p57)
    assert(!p57.contains("max_by"),
      "IVF assignment regressed to the aggregate shape:\n" + p57)
  }

  test("q54: multimodal meta scan prunes unused document columns") {
    val p = plan(Multimodal.queries("q54_multimodal_meta")(spark, dir))
    assert(!p.contains("n_chars"), "q54 must not read n_chars:\n" + p)
  }

  test("q79: incremental dedup joins the band index, never corpus × corpus") {
    val p = plan(Dedup.queries("q79_incremental_dedup")(spark, dir))
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "candidate generation must stay an equi-join on band keys:\n" + p)
  }

  test("q68/q85: decontamination broadcasts the eval side — corpus text never shuffles") {
    for (q <- Seq("q68_decontaminate", "q85_decontaminate_substr")) {
      val p = plan(CorpusOps.queries(q)(spark, dir))
      assert(p.contains("BroadcastHashJoin"), s"$q eval join not broadcast:\n$p")
    }
  }

  test("q84: PII scrub is a pure per-row projection — no exchange") {
    val p = plan(TextAnalysis.queries("q84_pii_scrub")(spark, dir))
    assert(!p.contains("Exchange"), "per-row scrub gained a shuffle:\n" + p)
  }

  test("q176: the Gopher gate is one map-only pass — no exchange") {
    val p = plan(TextAnalysis.queries("q176_gopher_rules")(spark, dir))
    assert(!p.contains("Exchange"), "in-row rule gate gained a shuffle:\n" + p)
  }

  test("q88: decile bucketing broadcasts the boundary row — no global sort, no window") {
    val p = plan(TextAnalysis.queries("q88_quality_deciles")(spark, dir))
    assert(p.contains("BroadcastExchange"), "boundaries not broadcast:\n" + p)
    assert(!p.contains("Window"), "ntile-style single-reducer window crept in:\n" + p)
    assert(!p.contains("Sort "), "global sort crept in:\n" + p)
  }

  test("q86: cluster sample keeps the two-phase quota (local window keyed by partition id)") {
    val p = plan(Similarity.queries("q86_cluster_sample")(spark, dir))
    // phase 1's window key carries SPARK_PARTITION_ID — the whole corpus
    // must never funnel through k=8 reducers in a single global window
    assert(p.toLowerCase.contains("spark_partition_id"),
      "two-phase quota collapsed to a single per-cluster window:\n" + p)
    // count operator occurrences via the formatted detail-section headers
    // "(n) Window" — the tree section would double-count a single node
    assert("\\(\\d+\\) Window".r.findAllIn(p).size >= 2,
      "expected both quota phases as Window operators:\n" + p)
  }

  test("q80: dataset split is a pure per-row projection — no exchange") {
    val p = plan(CorpusOps.queries("q80_dataset_split")(spark, dir))
    assert(!p.contains("Exchange"), "split must not shuffle:\n" + p)
    // formatted explain stars codegen'd operators
    assert(p.contains("* Project"), "split should codegen:\n" + p)
  }

  test("q72: k-means assignment is a pure map — no exchange anywhere") {
    val p = plan(Similarity.queries("q72_kmeans_assign")(spark, dir))
    assert(!p.contains("Exchange"), "assignment must not shuffle:\n" + p)
  }

  test("q73: LM count aggregates keep their map-side partial phase") {
    val p = plan(CorpusOps.queries("q73_lm_perplexity")(spark, dir))
    assert(p.contains("partial_count") || p.contains("partial"),
      "bigram/unigram counts lost map-side combine:\n" + p)
  }

  test("q82: ANN serves from the stored index — probes are the only signed side") {
    val p = plan(Similarity.queries("q82_ann_index")(spark, dir))
    assert(p.contains("graft_ann_index"),
      "corpus side must scan the materialized ANN index:\n" + p)
    val kernels = "lsh_band_sigs".r.findAllIn(p).length
    assert(kernels == 1,
      s"expected exactly one probe-side lsh_band_sigs kernel, found $kernels:\n" + p)
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "candidate generation must stay a (band, sig) equi-join:\n" + p)
  }

  test("q83: IVF serves from the stored quantizer and inverted lists") {
    val p = plan(Similarity.queries("q83_ivf_index")(spark, dir))
    assert(p.contains("graft_ivf_index"),
      "candidates and re-rank must scan the materialized IVF index:\n" + p)
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "candidate generation must stay a list_id equi-join:\n" + p)
    // the quantizer must NOT retrain at serve time: no corpus-wide
    // centroid aggregation may appear in the serving plan
    assert(!p.contains("cent_id"),
      "serving plan re-trains the quantizer:\n" + p)
  }

  test("q91: SQ8 serves from stored codes — no float-vector reads, no retrain") {
    val p = plan(Similarity.queries("q91_sq8_index")(spark, dir))
    assert(p.contains("graft_sq8_index"),
      "corpus side must scan the materialized SQ8 code table:\n" + p)
    // the quantizer must NOT retrain at serve time: training is a
    // posexplode + per-dimension min/max aggregate — neither may appear
    assert(!p.contains("posexplode") && !p.contains("PosExplode"),
      "serving plan re-trains the SQ8 quantizer:\n" + p)
    // the corpus participates only through codes + stored norms — the
    // serving plan must never touch the float `embedding` column of the
    // corpus table (the probe side reads its own embeddings, from the
    // probe filter's scan)
    assert(!p.contains("embeddings.parquet") ||
      p.split('\n').count(_.contains("embeddings.parquet")) <= 1,
      "serving plan reads corpus float vectors:\n" + p)
  }

  test("q93: PQ serves from stored codes — no retrain, no corpus float reads") {
    val p = plan(Similarity.queries("q93_pq_index")(spark, dir))
    assert(p.contains("graft_pq_index"),
      "corpus side must scan the materialized PQ code table:\n" + p)
    assert(!p.contains("posexplode") && !p.contains("PosExplode"),
      "serving plan re-trains the PQ codebook:\n" + p)
    assert(!p.contains("embeddings.parquet") ||
      p.split('\n').count(_.contains("embeddings.parquet")) <= 1,
      "serving plan reads corpus float vectors:\n" + p)
  }

  test("q183: residual IVF-PQ serves from the stored model — no retrain, ADC reads stored codes") {
    val p = plan(Similarity.queries("q183_ivfpq_index")(spark, dir))
    assert(p.contains("graft_ivfpq_index"),
      "ADC and refine must scan the materialized residual IVF-PQ index:\n" + p)
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "candidate generation must stay a list_id equi-join:\n" + p)
    // neither model trains at serve time: the quantizer aggregation keys
    // on cent_id and the codebook train posexplodes residuals — neither
    // may appear in the serving plan
    assert(!p.contains("cent_id"),
      "serving plan re-trains the IVF quantizer:\n" + p)
    assert(!p.contains("posexplode") && !p.contains("PosExplode"),
      "serving plan re-trains the residual codebook:\n" + p)
    // corpus floats are touched only through the index's stored vectors
    // (the refine side); the raw embeddings table appears once, for the
    // probe filter's own scan
    assert(!p.contains("embeddings.parquet") ||
      p.split('\n').count(_.contains("embeddings.parquet")) <= 1,
      "serving plan reads corpus float vectors outside the index:\n" + p)
  }

  test("q89: global ordinal is two-pass — corpus ranking keyed by bucket, offsets broadcast") {
    val p = plan(CorpusOps.queries("q89_shard_export")(spark, dir))
    // the corpus-side row_number must be PARTITIONED (by the hash-prefix
    // bucket) — the naive shape is one row_number over an empty partition
    // spec, i.e. the whole corpus through a single reducer
    assert(p.contains("row_number() windowspecdefinition(bucket"),
      "corpus ranking lost its bucket partitioning:\n" + p)
    // the cumulative offsets (a buckets-sized frame) join back broadcast —
    // the corpus never shuffles a second time for them
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast-join back:\n" + p)
  }

  test("q128: vocab growth rides the two-pass ordinal; corpus ranking stays bucket-keyed") {
    val p = plan(TextAnalysis.queries("q128_vocab_growth")(spark, dir))
    // the corpus-side row_number keeps its hash-prefix bucket key (q89's
    // shape); the only unpartitioned windows are the cumulative sums over
    // the VOCAB_CHECKPOINTS-row growth frame and the 256-row offsets
    assert(p.contains("row_number() windowspecdefinition(bucket"),
      "ordinal ranking lost its bucket partitioning:\n" + p)
    assert(!p.contains("row_number() windowspecdefinition(user_id") &&
      !"row_number\\(\\) windowspecdefinition\\(\\)".r.findFirstIn(p).isDefined,
      "no corpus-wide unpartitioned ranking:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast-join back:\n" + p)
  }

  test("q81: the corpus side comes from the stored index — zero corpus recompute") {
    val p = plan(Dedup.queries("q81_incremental_index")(spark, dir))
    // the whole point of the materialized path: corpus band keys and
    // signatures are READ (parquet scans of the index), never re-derived —
    // exactly one minhash16 kernel may appear, on the delta side
    assert(p.contains("graft_band_index"),
      "corpus side must scan the materialized index:\n" + p)
    val kernels = "minhash_k".r.findAllIn(p).length
    assert(kernels == 1,
      s"expected exactly one delta-side minhash kernel, found $kernels:\n" + p)
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "candidate generation must stay an equi-join on band keys:\n" + p)
  }

  test("q101: the vocab side broadcasts; q103: first-occurrence window keys on the block hash") {
    val p101 = plan(TextAnalysis.queries("q101_oov_rate")(spark, dir))
    assert(p101.contains("BroadcastHashJoin"),
      "q101's 100-row vocab must broadcast, never shuffle the corpus twice:\n" + p101)
    assert(p101.contains("TakeOrderedAndProject"),
      "q101's vocab top-k must stay a TakeOrdered:\n" + p101)
    val p103 = plan(CorpusOps.queries("q103_dedup_scrub")(spark, dir))
    // the keep rule must be the min(struct) AGGREGATE (map-side partial
    // combine — the hottest block in a real corpus is boilerplate repeated
    // 10^6+ times), never a row_number window partitioned by the block
    // hash: a window sorts every occurrence of the hot block on ONE
    // reducer with no partial phase
    assert(p103.contains("partial_min"),
      "q103's first-occurrence winner lost its map-side partial phase:\n" + p103)
    assert(!p103.contains("row_number()"),
      "q103's keep rule regressed to a single-reducer ranking window:\n" + p103)
    assert(!p103.contains("Cartesian") && !p103.contains("BroadcastNestedLoop"),
      "q103 must never compare blocks pairwise:\n" + p103)
  }

  test("q63/q75: ranked takes over low-cardinality keys stay two-phase") {
    // `lang`/`source` have a handful of values — a single ranked window
    // over them funnels the whole corpus through that many reducers. The
    // q86 two-phase shape: phase 1's window key carries the partition id.
    for ((q, m) <- Seq(
      "q63_stratified_sample" -> TextAnalysis.queries,
      "q75_temperature_mix" -> CorpusOps.queries)) {
      val p = plan(m(q)(spark, dir))
      assert(p.toLowerCase.contains("spark_partition_id"),
        s"$q collapsed to a single per-key window:\n$p")
      assert("\\(\\d+\\) Window".r.findAllIn(p).size >= 2,
        s"$q expected both quota phases as Window operators:\n$p")
    }
  }

  test("q70: packing cumsum is two-pass — corpus window keyed by (lang, bucket), offsets broadcast") {
    val p = plan(CorpusOps.queries("q70_pack_sequences")(spark, dir))
    // the corpus-side running sum must be partitioned by (lang, bucket) —
    // a per-lang-only frame is one sequential reducer per language
    assert("windowspecdefinition\\(lang#\\d+, bucket#\\d+, doc_id#".r
      .findFirstIn(p).isDefined,
      "q70's corpus cumsum lost its bucket partitioning:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "q70's bucket offsets must broadcast-join back:\n" + p)
  }

  test("q77: canonical winner is an aggregate with a partial phase, not a cluster window") {
    val p = plan(Dedup.queries("q77_canonical_best")(spark, dir))
    // mega-clusters (boilerplate) are exactly what dedup produces — the
    // winner must map-side combine, never rank a cluster on one reducer
    assert(p.contains("partial_max"),
      "q77's winner aggregate lost its map-side partial phase:\n" + p)
    assert(!p.contains("row_number()"),
      "q77 regressed to a per-cluster ranking window:\n" + p)
  }

  test("q105: box query scans the stored layout with zkey ranges pushed to parquet") {
    val p = plan(Spatial.queries("q105_zrange_box")(spark, dir))
    assert(p.contains("graft_zorder_layout"),
      "q105 must serve from the materialized z-order layout:\n" + p)
    // the range predicates must reach the scan as pushed zkey bounds —
    // stats-based file/row-group skipping is the whole point of the
    // range-sorted layout; a post-scan-only filter would read everything
    assert(p.split('\n').exists(l =>
      l.contains("PushedFilters") && l.contains("zkey")),
      "q105's zkey ranges did not reach the parquet scan:\n" + p)
    // and the key is STORED: the Morton cascade must not recompute at
    // read time (its spread-bits masks would appear in the plan)
    assert(!p.contains("1431655765"),
      "q105 recomputes the Morton cascade at read time:\n" + p)
  }

  test("q143: BM25 serves from stored postings with the term predicate pushed") {
    val p = plan(Bm25.queries("q143_bm25_topk")(spark, dir))
    assert(p.contains("graft_bm25_v2"),
      "q143 must serve from the materialized postings:\n" + p)
    // the ≤3-term isin must reach the postings scan — row-group pruning
    // on the token-sorted layout is what keeps serving df-bounded
    assert(p.split('\n').exists(l =>
      l.contains("PushedFilters") && l.contains("token")),
      "q143's term filter did not reach the postings scan:\n" + p)
    // norms are denormalized into postings: no corpus tokenization and
    // no corpus-sized doclen join may reappear at serve time
    assert(!p.contains("split(text"),
      "q143 re-tokenizes the corpus at serve time:\n" + p)
    assert(p.contains("TakeOrderedAndProject"),
      "q143's top-k lost its TakeOrdered shape:\n" + p)
  }

  test("q153/q154: the register path never builds a type table") {
    // HLL's whole scale claim is that registers come from the OCCURRENCE
    // stream: no distinct and no (source, tri) aggregate may appear in
    // the serve half (q154 reads stored registers + delta partials). The
    // inline q153 carries the exact-audit column, so only q154 is the
    // honest register-path probe.
    val p = plan(TextAnalysis.queries("q154_hll_maintenance")(spark, dir))
    // no aggregate may key on the trigram column (tri#N in a Keys list)
    // and no distinct operator may appear — registers aggregate (source,
    // idx) straight off the occurrence stream
    assert(!p.split('\n').exists(l => l.contains("Keys") && l.contains("tri#")),
      "register maintenance gained a trigram-keyed aggregate:\n" + p)
    assert(!p.contains("count(distinct"),
      "register maintenance gained a distinct pass:\n" + p)
    assert(p.contains("partial"),
      "register max-merge lost map-side partials:\n" + p)
  }

  test("q158: both audit query sets compile to TakeOrderedAndProject") {
    val p = plan(TextAnalysis.queries("q158_count_min")(spark, dir))
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      "head/tail query sets lost their TakeOrdered shape:\n" + p)
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q159: candidates stay a shingle equi-join, never corpus x corpus") {
    val p = plan(Dedup.queries("q159_excerpt_containment")(spark, dir))
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "containment candidates regressed to a pairwise comparison:\n" + p)
  }

  test("q160: all five lags ride ONE window pass (one per-user sort)") {
    val p = plan(TimeSeries.queries("q160_acf")(spark, dir))
    // one Window operator computes every lead; a per-lag window would
    // multiply the user-keyed sort by ACF_LAGS
    assert("\\bWindow \\[".r.findAllIn(p).size <= 2, // leads + n/s counts
      "lags split into separate window passes:\n" + p)
  }

  test("q151: both Zipfian marginal joins keep map-side partial aggs") {
    val p = plan(CorpusOps.queries("q151_kneser_ney")(spark, dir))
    assert(p.contains("partial"), p)
    // the 1-row type-count attach is a deliberate broadcast NLJ (the q73
    // scalar shape); only a true Cartesian is a regression
    assert(!p.contains("CartesianProduct"),
      "the bigram scoring path gained a pairwise join:\n" + p)
  }

  test("q104: the composed build keeps every stage's audited shape") {
    val p = plan(graft.CorpusBuild.queries("q104_corpus_build")(spark, dir))
    // no stage may regress to a pairwise comparison, and the shard
    // ordinal must stay the two-pass shape (bucket-partitioned ranking)
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      "composed build gained a pairwise comparison:\n" + p)
    assert(p.contains("row_number() windowspecdefinition(bucket"),
      "shard ordinal lost its bucket partitioning:\n" + p)
    spark.catalog.clearCache() // buildFrames caches register upstream
  }
}
