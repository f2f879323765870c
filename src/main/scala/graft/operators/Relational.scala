package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.1–2.6) re-expressed over
  * the driver test tables. Each query has a DuckDB oracle.
  *
  * Scale design notes (the same queries on a 1000-executor cluster):
  *  - filters/projections are plain Catalyst predicates/projections → pushed
  *    into the parquet scan (PushedFilters/ReadSchema verified via explain);
  *  - dimension tables (region 5, nation 25, supplier ≤1k) are joined with an
  *    explicit `broadcast` hint — no shuffle of the fact table for them;
  *  - aggregations group by low-cardinality keys → partial aggregation
  *    map-side, tiny shuffle;
  *  - window/top-k per group shuffles once on the partition key;
  *  - floating-point aggregates are rounded identically on both engines so
  *    the driver's hash compare is stable against summation order.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** TPC-H Q1 shape: scan + filter + groupBy agg (SURVEY §2.4). */
  def q01Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  /** Predicate + projection pushdown (SURVEY §2.2 query-dict→WHERE compiler):
    * equality + range + comparison predicates, narrow ReadSchema.
    */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_size").between(10, 30) &&
        col("p_retailprice") > 1200.0)
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        round(col("p_retailprice"), 2).as("price"))

  /** Multi-way join with broadcast dimensions (TPC-H Q5 shape): revenue per
    * nation. Dims are broadcast → single shuffle for the group-by.
    */
  def q03JoinBroadcast(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Anti join (SURVEY §2.3 `getUnsearchedQuery`): customers with no orders. */
  def q04AntiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Semi join (EXISTS): suppliers with at least one 1998 shipment. */
  def q05SemiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier")
      .join(
        t(spark, dir, "lineitem").filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp")),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))

  /** Union of per-source result sets (SURVEY §2.6 multi-archive concat) with
    * dedup, like the cross-database crossmatch.
    */
  def q06Union(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val big = o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    big.unionByName(urgent).distinct()
  }

  /** Distinct over selected columns (`vizier_tap_base.py:170-179` SELECT-set dedup). */
  def q07Distinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer").select(col("c_mktsegment"), col("c_nationkey")).distinct()

  /** Global top-k (`getBestCoord` argmax): 10 priciest orders, deterministic
    * tiebreak. TakeOrdered physical op — no full sort at scale.
    */
  def q08TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
      .limit(10)

  /** Per-group top-1 (`nearest` cone result / row_number()=1): each
    * customer's most expensive order.
    */
  def q09WindowTop1(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("best_price"))
  }

  /** Sliding/running window (SAX sliding-window shape on the relational
    * surface): running revenue per supplier in ship order.
    */
  def q10WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "lineitem")
      .filter(col("l_suppkey") <= 10)
      .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
  }

  /** Comparative broadcast cross join (SURVEY §2.3 `ComparativeBase`):
    * every customer × a small template set of suppliers, |acctbal| distance,
    * aggregated closest / average / best-5 per customer — exactly the
    * reference's `closest`/`average`/`bestN` methods.
    */
  def q11CompareCross(spark: SparkSession, dir: String): DataFrame = {
    val templates = t(spark, dir, "supplier").filter(col("s_suppkey") <= 20)
      .select(col("s_suppkey"), col("s_acctbal"))
    val pairs = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .crossJoin(broadcast(templates))
      .withColumn("dist", abs(col("c_acctbal") - col("s_acctbal")))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("dist"), col("s_suppkey"))
    pairs
      .withColumn("rn", row_number().over(w))
      .groupBy(col("c_custkey"))
      .agg(
        round(min(col("dist")), 2).as("closest"),
        round(avg(col("dist")), 4).as("average"),
        round(avg(when(col("rn") <= 5, col("dist"))), 4).as("best5"))
  }

  /** Confusion-matrix style conditional pivot (`BaseDecider.getStatistic`). */
  def q12ConditionalPivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("urgent"),
        sum(when(col("o_orderpriority") === "2-HIGH", 1).otherwise(0)).as("high"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("rest"),
        count(lit(1)).as("total"))

  /** Fixed-width binning histogram (`histogram` kernel, columnar analogue). */
  def q13Histogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .withColumn("bin", floor(col("l_quantity") / 5.0).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"), round(avg(col("l_extendedprice")), 2).as("avg_price"))

  /** Deterministic pseudo-random sample (`folder:N` restriction,
    * `stars_handling.py:121-136`): order by md5 of the key, take N — the
    * same rows in any engine.
    */
  def q14Sample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("h", md5(col("o_orderkey").cast("string")))
      .orderBy(col("h"))
      .limit(100)
      .select(col("o_orderkey"), col("o_orderstatus"))

  /** Cone search (SURVEY §2.1 `coneSearch`): synthetic ra/dec from order
    * columns; box prefilter (sargable, pushed) then exact haversine refine,
    * plus `nearest=True` = global top-1 — the reference's two-stage plan.
    */
  def q15ConeSearch(spark: SparkSession, dir: String): DataFrame = {
    val raC = 180.0
    val decC = 0.0
    val delta = 18.0
    val o = t(spark, dir, "orders")
      .withColumn("ra", col("o_orderkey") % 360)
      .withColumn("dec", (col("o_custkey") % 180) - 90)
      // box prefilter — mirrors `_getRanges` (no cos(dec) scaling, faithfully)
      .filter(col("ra").between(raC - delta, raC + delta) &&
        col("dec").between(decC - delta, decC + delta))
    val dist = lit(2.0) * asin(sqrt(
      pow(sin(radians(col("dec") - decC) / 2), 2) +
        cos(radians(col("dec"))) * cos(lit(math.toRadians(decC))) *
        pow(sin(radians(col("ra") - raC) / 2), 2)))
    o.withColumn("dist_deg", round(degrees(dist), 6))
      .filter(col("dist_deg") < delta)
      .select(col("o_orderkey"), col("ra"), col("dec"), col("dist_deg"))
  }

  /** Grid cartesian product (`get_combinations` / ParamGrid). */
  def q16GridCross(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val brands = p.select(col("p_brand")).distinct()
    val sizes = p.select(col("p_size")).distinct().filter(col("p_size") <= 10)
    brands.crossJoin(sizes)
  }

  /** Set difference (`except`, plan−done diff). */
  def q17Except(spark: SparkSession, dir: String): DataFrame = {
    val all = t(spark, dir, "orders").select(col("o_custkey"))
    val recent = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    all.except(recent)
  }

  /** ROC threshold sweep (`getROC`): score = totalprice scaled to [0,1],
    * label = 'F' status; 9 thresholds → (fpr, tpr) per threshold via a
    * single conditional aggregation pass (not one scan per threshold).
    */
  def q18RocSweep(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    // scalar "subquery" via broadcast crossJoin: the max stays on the
    // cluster — one job, no driver-side .first() synchronization point
    val maxP = o.agg(max(col("o_totalprice")).as("_maxp"))
    val scored = o.crossJoin(broadcast(maxP)).select(
      (col("o_totalprice") / col("_maxp")).as("score"),
      when(col("o_orderstatus") === "F", 1).otherwise(0).as("label"))
    val th = spark.range(1, 10).select((col("id") / 10.0).as("thr"))
    scored.crossJoin(broadcast(th))
      .groupBy(col("thr"))
      .agg(
        round(sum(when(col("score") >= col("thr") && col("label") === 1, 1).otherwise(0)) /
          sum(col("label")).cast("double"), 6).as("tpr"),
        round(sum(when(col("score") >= col("thr") && col("label") === 0, 1).otherwise(0)) /
          sum(lit(1) - col("label")).cast("double"), 6).as("fpr"))
  }

  /** Probability-combine + threshold filter (`StarsFilter.filterStars`
    * min/mean/max semantics, §2.2): two deterministic pseudo-probabilities
    * per customer, combined all three ways, passed = mean ≥ 0.5.
    */
  def q19FilterCombine(spark: SparkSession, dir: String): DataFrame = {
    // p1/p2 are decimal-exact (divisors are powers of 10), so no rounding is
    // needed anywhere — identical IEEE expressions on both engines produce
    // bit-identical doubles. round() here would risk boundary disagreement.
    val c = t(spark, dir, "customer")
      .withColumn("p1", (col("c_acctbal") + 1000.0) / 10000.0)
      .withColumn("p2", (col("c_custkey") % 100) / 100.0)
    c.withColumn("comb_min", least(col("p1"), col("p2")))
      .withColumn("comb_max", greatest(col("p1"), col("p2")))
      .withColumn("comb_mean", (col("p1") + col("p2")) / 2)
      .filter(col("comb_mean") >= 0.5)
      .select(col("c_custkey"), col("comb_min"), col("comb_max"), col("comb_mean"))
  }

  /** Null scrubbing (BAD_VALUES / dropna, §1.2): sentinel → null → drop,
    * count survivors per nation.
    */
  def q20NullScrub(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .withColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .na.drop(Seq("bal"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_ok"), round(avg(col("bal")), 4).as("avg_bal"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> q01Agg,
    "q02_filter_project" -> q02FilterProject,
    "q03_join_broadcast" -> q03JoinBroadcast,
    "q04_anti_join" -> q04AntiJoin,
    "q05_semi_join" -> q05SemiJoin,
    "q06_union" -> q06Union,
    "q07_distinct" -> q07Distinct,
    "q08_topk" -> q08TopK,
    "q09_window_top1" -> q09WindowTop1,
    "q10_window_running" -> q10WindowRunning,
    "q11_compare_cross" -> q11CompareCross,
    "q12_conditional_pivot" -> q12ConditionalPivot,
    "q13_histogram" -> q13Histogram,
    "q14_sample" -> q14Sample,
    "q15_cone_search" -> q15ConeSearch,
    "q16_grid_cross" -> q16GridCross,
    "q17_except" -> q17Except,
    "q18_roc_sweep" -> q18RocSweep,
    "q19_filter_combine" -> q19FilterCombine,
    "q20_null_scrub" -> q20NullScrub)

  val oracleSql: Map[String, String] = Map(
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT p_partkey, p_name, p_size, round(p_retailprice, 2) AS price
        |FROM part
        |WHERE p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
        |  AND p_retailprice > 1200.0""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q04_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q05_semi_join" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_suppkey = s_suppkey
        |    AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00')""".stripMargin,
    "q06_union" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
        |UNION
        |SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'""".stripMargin,
    "q07_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "q08_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q09_window_top1" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) WHERE rn = 1""".stripMargin,
    "q10_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 10""".stripMargin,
    "q11_compare_cross" ->
      """WITH pairs AS (
        |  SELECT c_custkey, abs(c_acctbal - s_acctbal) AS dist,
        |    row_number() OVER (PARTITION BY c_custkey
        |                       ORDER BY abs(c_acctbal - s_acctbal), s_suppkey) AS rn
        |  FROM customer CROSS JOIN (SELECT * FROM supplier WHERE s_suppkey <= 20))
        |SELECT c_custkey, round(min(dist), 2) AS closest,
        |  round(avg(dist), 4) AS average,
        |  round(avg(CASE WHEN rn <= 5 THEN dist END), 4) AS best5
        |FROM pairs GROUP BY c_custkey""".stripMargin,
    "q12_conditional_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS rest,
        |  count(*) AS total
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q13_histogram" ->
      """SELECT CAST(floor(l_quantity / 5.0) AS BIGINT) AS bin,
        |  count(*) AS cnt, round(avg(l_extendedprice), 2) AS avg_price
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q14_sample" ->
      """SELECT o_orderkey, o_orderstatus FROM
        |(SELECT *, md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders
        | ORDER BY h LIMIT 100)""".stripMargin,
    "q15_cone_search" ->
      """WITH pts AS (
        |  SELECT o_orderkey, o_orderkey % 360 AS ra, (o_custkey % 180) - 90 AS dec
        |  FROM orders)
        |SELECT o_orderkey, ra, dec,
        |  round(degrees(2 * asin(sqrt(
        |    pow(sin(radians(dec - 0.0) / 2), 2) +
        |    cos(radians(dec)) * cos(radians(0.0)) *
        |    pow(sin(radians(ra - 180.0) / 2), 2)))), 6) AS dist_deg
        |FROM pts
        |WHERE ra BETWEEN 162 AND 198 AND dec BETWEEN -18 AND 18
        |  AND round(degrees(2 * asin(sqrt(
        |    pow(sin(radians(dec - 0.0) / 2), 2) +
        |    cos(radians(dec)) * cos(radians(0.0)) *
        |    pow(sin(radians(ra - 180.0) / 2), 2)))), 6) < 18.0""".stripMargin,
    "q16_grid_cross" ->
      """SELECT * FROM (SELECT DISTINCT p_brand FROM part)
        |CROSS JOIN (SELECT DISTINCT p_size FROM part WHERE p_size <= 10)""".stripMargin,
    "q17_except" ->
      """SELECT o_custkey FROM orders
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'""".stripMargin,
    "q18_roc_sweep" ->
      """WITH m AS (SELECT max(o_totalprice) AS mp FROM orders),
        |scored AS (
        |  SELECT o_totalprice / mp AS score,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        |  FROM orders, m),
        |th AS (SELECT i / 10.0 AS thr FROM generate_series(1, 9) t(i))
        |SELECT thr,
        |  round(sum(CASE WHEN score >= thr AND label = 1 THEN 1 ELSE 0 END)
        |    / CAST(sum(label) AS DOUBLE), 6) AS tpr,
        |  round(sum(CASE WHEN score >= thr AND label = 0 THEN 1 ELSE 0 END)
        |    / CAST(sum(1 - label) AS DOUBLE), 6) AS fpr
        |FROM scored CROSS JOIN th GROUP BY thr""".stripMargin,
    "q19_filter_combine" ->
      """WITH p AS (
        |  SELECT c_custkey,
        |    (c_acctbal + 1000.0) / 10000.0 AS p1,
        |    (c_custkey % 100) / 100.0 AS p2
        |  FROM customer)
        |SELECT c_custkey, least(p1, p2) AS comb_min, greatest(p1, p2) AS comb_max,
        |  (p1 + p2) / 2 AS comb_mean
        |FROM p WHERE (p1 + p2) / 2 >= 0.5""".stripMargin,
    "q20_null_scrub" ->
      """SELECT c_nationkey, count(*) AS n_ok, round(avg(bal), 4) AS avg_bal
        |FROM (SELECT c_nationkey,
        |        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        |      FROM customer)
        |WHERE bal IS NOT NULL
        |GROUP BY c_nationkey""".stripMargin)
}
