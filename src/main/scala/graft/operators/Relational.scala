package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.1–2.6) re-expressed over
  * the driver test tables. Each query has a DuckDB oracle.
  *
  * Scale notes: filters/projections are pushed to the parquet scan; small
  * dimension tables (region/nation/supplier/customer at low SF) are joined
  * via `broadcast`; aggregates rely on partial (map-side) aggregation.
  * Floating-point aggregates are rounded in BOTH engines so the driver's
  * hash compare is stable against summation order.
  */
object Relational {

  /** TPC-H Q1 shape: scan + filter + groupBy agg (SURVEY §2.4).
    * Pushdown: shipdate filter + 7-column read schema reach the scan.
    */
  def q01Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> q01Agg
  )

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
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
