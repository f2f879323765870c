package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys. AQE's skew-join handles
  * sort-merge spills at runtime, but when a handful of keys dominate (the
  * "null island" / default-value problem of real corpora) the standard
  * pre-emptive fix is salting: spread each hot key over `salts` reducer
  * slots by widening the join key with a salt column.
  */
object Skew {

  /** Inner equi-join with a salted key: the build side is replicated once
    * per salt value and the join runs on (key, salt), so a hot key's rows
    * land on `salts` different reducers instead of one. Build-side cost is
    * a bounded ×`salts` blow-up, the price of removing the straggler; the
    * result set is exactly the plain join's — every probe row joins the
    * same replicated build rows whatever its salt.
    *
    * `uniqueKey` names a column whose values are unique per row (an id):
    * the salt hashes it, so it is DETERMINISTIC under stage recomputation
    * and still spreads identical-content rows. Probes without any unique
    * column can use [[saltedJoinUnstable]], which synthesizes one — at a
    * documented fault-tolerance cost.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int, uniqueKey: String): DataFrame =
    saltedWith(probe, build, key, salts, pmod(hash(col(uniqueKey)), lit(salts)))

  /** [[saltedJoin]] with a salt derived from `monotonically_increasing_id`
    * for probes lacking a per-row unique column. The synthetic id is
    * row-order-dependent: if the probe is itself a nondeterministically
    * ordered shuffle output, a PARTIAL stage recomputation can re-salt rows
    * inconsistently (Spark's indeterminate-stage rollback is the only
    * guard). Safe for storage-backed probes; prefer the deterministic
    * overload in fault-tolerant pipelines — the explicit name is the
    * opt-in.
    */
  def saltedJoinUnstable(probe: DataFrame, build: DataFrame, key: String,
                         salts: Int): DataFrame =
    saltedWith(probe, build, key, salts,
      pmod(hash(monotonically_increasing_id()), lit(salts)))

  /** Frequency-gated salted join — the production wiring shape: only probe
    * rows whose key appears in `hotKeys` (a BOUNDED, broadcastable table of
    * heavy-hitter key values, e.g. `counts.filter(c >= perReducerBudget)`)
    * take the salted path; the cold majority joins plain, paying zero
    * replication. Build rows are replicated ×`salts` ONLY for hot keys, so
    * the blow-up is |hotKeys|·salts rows regardless of corpus size. Result
    * equals the plain inner join exactly (SkewSpec proves both paths).
    *
    * `hotKeys` must be derivable without an extra corpus pass wherever
    * possible — a count table the query already builds (q73's unigram
    * counts), a dimension-side statistic, or ANALYZE-style metadata.
    */
  def saltedJoinGated(probe: DataFrame, build: DataFrame, key: String,
                      salts: Int, uniqueKey: String,
                      hotKeys: DataFrame): DataFrame = {
    // one shared distinct subtree: the probe tag and the build gate plan
    // the same broadcast, so ReuseExchange ships it once
    val hot = hotKeys.select(col(key)).distinct()
    val hk = broadcast(hot.withColumn("_hot", lit(true)))
    val tagged = probe.join(hk, Seq(key), "left")
    val hotProbe = tagged.filter(col("_hot").isNotNull).drop("_hot")
    val cold = tagged.filter(col("_hot").isNull).drop("_hot")
    val hotBuild = build.join(broadcast(hot), Seq(key))
    saltedJoin(hotProbe, hotBuild, key, salts, uniqueKey)
      .unionByName(cold.join(build, Seq(key)))
  }

  /** A key only becomes a straggler when its row count materially exceeds
    * the MEAN per-reducer load — below that, the reducer holding it
    * finishes with the pack and salting is pure overhead (replication +
    * the widened shuffle key; measured 1.85× on q73 at sf0.1 where the
    * head key is 1.1× the mean load). The budget multiplier: a key is hot
    * when `cnt ≥ StragglerFactor × totalRows / shufflePartitions`.
    */
  val StragglerFactor = 2.0

  /** [[saltedJoinGated]] with the hot set derived from a STRAGGLER BUDGET
    * instead of a fixed row count: keys are salted only when their
    * probe-row count crosses [[StragglerFactor]] × the mean per-reducer
    * load, and when NO key crosses it the plain join returns untouched —
    * zero tagging, replication, or union cost. This is the
    * production-correct dial at every scale: a Zipfian head token at
    * 100 TB holds several percent of all rows and crosses any per-reducer
    * budget, while a merely-common key at local scale does not (and
    * salting it would only tax the join).
    *
    * `keyCounts(key, cntCol)` is a count table the caller already has
    * (q73 passes its unigram counts) — the decision costs ONE tiny
    * aggregate over it, never a corpus pass. The decision (threshold,
    * max key count, chosen path) is recorded in [[graft.Telemetry]] so
    * bench artifacts show which plan actually ran.
    */
  def saltedJoinAdaptive(probe: DataFrame, build: DataFrame, key: String,
                         salts: Int, uniqueKey: String,
                         keyCounts: DataFrame, cntCol: String): DataFrame = {
    val stats = keyStats(keyCounts, cntCol).head()
    saltedJoinAdaptiveWith(probe, build, key, salts, uniqueKey, keyCounts,
      cntCol, stats.getLong(0), stats.getLong(1))
  }

  /** The (total, max) aggregate [[saltedJoinAdaptive]] decides from,
    * exposed unexecuted: a query with SEVERAL gated joins unions the
    * per-table stats frames and collects them in ONE driver-synchronized
    * job (the trigram-KN shape runs four gates — four sequential
    * construction-time jobs otherwise), then feeds each pair back
    * through [[saltedJoinAdaptiveWith]].
    */
  def keyStats(keyCounts: DataFrame, cntCol: String): DataFrame =
    keyCounts.agg(coalesce(sum(col(cntCol)), lit(0L)).as("total"),
      coalesce(max(col(cntCol)), lit(0L)).as("mx"))

  /** [[saltedJoinAdaptive]] with the decision statistics supplied by the
    * caller (from a batched [[keyStats]] collect) — no job runs here.
    */
  def saltedJoinAdaptiveWith(probe: DataFrame, build: DataFrame, key: String,
                             salts: Int, uniqueKey: String,
                             keyCounts: DataFrame, cntCol: String,
                             total: Long, maxCnt: Long): DataFrame = {
    val spark = probe.sparkSession
    val parallelism = spark.sessionState.conf.numShufflePartitions.max(1)
    val threshold = math.max(1L, (StragglerFactor * total / parallelism).toLong)
    if (maxCnt < threshold) {
      graft.Telemetry.record(
        s"skew key=$key path=plain max_cnt=$maxCnt threshold=$threshold")
      probe.join(build, Seq(key))
    } else {
      val hot = keyCounts.filter(col(cntCol) >= threshold)
      graft.Telemetry.record(
        s"skew key=$key path=salted max_cnt=$maxCnt threshold=$threshold")
      saltedJoinGated(probe, build, key, salts, uniqueKey, hot)
    }
  }

  private def saltedWith(probe: DataFrame, build: DataFrame, key: String,
                         salts: Int,
                         saltExpr: org.apache.spark.sql.Column): DataFrame = {
    require(salts > 1, "salts must exceed 1")
    val salted = probe.withColumn("_salt", saltExpr)
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
