package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase ranked take — ONE definition for every bounded
  * top-per-group over a LOW-CARDINALITY key (q86 cluster sample, q63
  * stratified sample, q75 temperature mix), where a single
  * `row_number over (partition by key)` would funnel the whole corpus
  * through #keys reducers.
  */
object Ranked {

  /** Top-`quota` rows per `keys` group in `order`, with the global rank
    * in `rankCol`. Phase 1 ranks per (keys, input-partition-id) — the
    * shuffle key carries the partition id, so even one group spreads
    * over every reducer — and forwards at most `quota` rows per
    * partition; phase 2 ranks the ≤ quota·partitions survivors per
    * group. Partitioning-independent: a global winner is necessarily a
    * local winner under the same deterministic `order`, so phase 2 sees
    * every winner regardless of how rows were distributed. `quota` may
    * be a literal or a per-row column (a joined per-group quota table).
    */
  def twoPhaseTopK(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                   quota: Column, rankCol: String = "rk"): DataFrame = {
    val local = Window.partitionBy(keys :+ col("_tp_pid"): _*).orderBy(order: _*)
    val global = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("_tp_pid", spark_partition_id())
      .withColumn("_tp_lrk", row_number().over(local))
      .filter(col("_tp_lrk") <= quota)
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= quota)
      .drop("_tp_pid", "_tp_lrk")
  }
}
