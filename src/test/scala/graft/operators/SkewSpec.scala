package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join: identical results to the plain join, and a heavy-hitter
  * key actually spreads across reducers instead of landing on one.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join and spreads the hot key") {
    // 90% of probe rows are IDENTICAL on one key — the null-island shape
    // that makes one reducer the straggler in a plain shuffle join (and
    // defeats any salt derived from row content alone)
    val probe = ((1 to 900).map(_ => (1L, "hot")) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, s"cold_$i")))
      .toDF("k", "payload")
    val build = (1L to 8L).map(k => (k, s"dim_$k")).toDF("k", "attr")

    // salting targets SHUFFLE joins (a broadcastable build side needs no
    // salt) — force the shuffle path for both plans
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE would re-merge these tiny test partitions and hide the spread
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
    val plain = probe.join(build, Seq("k"))
    val salted = Skew.saltedJoinUnstable(probe, build, "k", salts = 4)

    // exact result equality (same rows, same multiplicities)
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    val a = plain.groupBy("k", "payload", "attr").count()
    val b = salted.groupBy("k", "payload", "attr").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "salted join changed the result")

    // the reducer key must widen to (k, _salt): that is what spreads a hot
    // key over `salts` reducers (post-join partition ids at 4-partition toy
    // scale are hash-collision-flaky, so assert the plan + the salt spread)
    val sp = salted.queryExecution.executedPlan.toString
    assert(sp.contains("hashpartitioning(k") && sp.contains("_salt"),
      "salted join must shuffle on (k, _salt):\n" + sp)
    // the salt expression must spread even IDENTICAL rows (row-id based)
    val hotSalts = probe.filter(col("k") === 1L)
      .select(pmod(hash(monotonically_increasing_id()), lit(4)).as("s"))
      .distinct().count()
    assert(hotSalts == 4L, s"identical hot rows must spread across all 4 salts, got $hotSalts")

    // the deterministic uniqueKey path: same result set, hot key spread
    val withId = probe.withColumn("rid", monotonically_increasing_id()).cache()
    val saltedDet = Skew.saltedJoin(withId, build, "k", 4, uniqueKey = "rid")
    assert(saltedDet.count() == plain.count(), "uniqueKey path row count")
    val detSalts = withId.filter(col("k") === 1L)
      .select(pmod(hash(col("rid")), lit(4)).as("s")).distinct().count()
    assert(detSalts == 4L, "uniqueKey salt must spread the hot key")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("saltedJoinGated equals the plain join; only hot keys replicate") {
    val probe = ((1 to 900).map(i => (1L, s"hot_$i")) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, s"cold_$i")))
      .toDF("k", "payload")
      .withColumn("rid", monotonically_increasing_id()).cache()
    val build = (1L to 8L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    // gate: keys with >= 500 probe rows (only k=1 qualifies)
    val hot = probe.groupBy("k").count().filter(col("count") >= 500).select("k")

    val plain = probe.join(build, Seq("k"))
    val gated = Skew.saltedJoinGated(probe, build, "k", 4, "rid", hot)
    assert(gated.columns.sorted.sameElements(plain.columns.sorted))
    val a = plain.groupBy("k", "payload", "attr").count()
    val b = gated.groupBy("k", "payload", "attr").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "gated join changed the result")

    // the hot probe rows spread across all 4 salts (deterministic rid salt)
    val hotSalts = probe.filter(col("k") === 1L)
      .select(pmod(hash(col("rid")), lit(4)).as("s")).distinct().count()
    assert(hotSalts == 4L, "hot key must spread across all 4 salts")
  }

  test("q73's unigram join runs through the frequency-gated salted plan") {
    // the fixture vocabulary's head crosses HOT_KEY_ROWS from sf0.01 up,
    // so the salted branch carries real rows there (the correctness gate
    // hash-matches THROUGH it); here assert the plan is wired
    val plan = CorpusOps.queries("q73_lm_perplexity")(spark, "/root/testdata/sf0.001")
      .queryExecution.analyzed.toString
    assert(plan.contains("_salt"), "q73 must route w1 through the salted join:\n" +
      plan.take(2000))
  }
}
