package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism pinning for CPU-DENSE kernel stages.
  *
  * AQE coalesces post-shuffle partitions by BYTES
  * (`advisoryPartitionSizeInBytes`, floor
  * `coalescePartitions.minPartitionSize` = 1 MB), which is the right
  * model for byte-bound stages but starves a stage whose cost-per-byte
  * is orders of magnitude above a scan — a 512-point period grid over
  * in-row curves, or the descriptor/decider chain over collected stars:
  * at bench scale the whole aggregated frame is a few MB, so AQE packs
  * it into 1–3 tasks and the kernel runs on 1–3 cores of however many
  * the machine has (measured: q177 spent ~7 s in a 2-task stage on
  * local[32]).
  *
  * Fix: pin the aggregation exchange's partition count by repartitioning
  * ON THE GROUPING KEY immediately before the groupBy — the aggregate's
  * required ClusteredDistribution is satisfied by the explicit
  * HashPartitioning, so NO extra exchange is inserted (plan-asserted in
  * SpreadSpec), and an explicit numPartitions opts that one exchange out
  * of AQE coalescing. The count is scale-adaptive, never a constant:
  * max(defaultParallelism, spark.sql.shuffle.partitions) — on a real
  * cluster this equals the tuned shuffle width (where byte-based
  * coalescing wouldn't have fired anyway, partials keeping their own
  * exchange), locally it equals the core count. Override with
  * `spark.graft.kernel.parallelism` where a deployment's kernel stages
  * need a different width than its shuffles.
  *
  * Trade-off note (why this is not blanket policy): repartition-before-
  * groupBy forgoes map-side partial aggregation. Every call site here
  * aggregates with `collect_list` (partials concatenate — zero byte
  * reduction), so nothing is lost; do NOT use this in front of reducing
  * aggregates.
  */
object Spread {

  val KERNEL_PARALLELISM_CONF = "spark.graft.kernel.parallelism"

  def kernelParallelism(df: DataFrame): Int = {
    val spark = df.sparkSession
    spark.conf.getOption(KERNEL_PARALLELISM_CONF).map(_.toInt).getOrElse(
      math.max(spark.sparkContext.defaultParallelism,
        spark.sessionState.conf.numShufflePartitions))
  }

  /** Repartition `df` by `key` at the pinned kernel parallelism — place
    * directly before a `groupBy(key)` whose output feeds a CPU-dense
    * per-row kernel.
    */
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(kernelParallelism(df), key)

  /** Round-robin respread of a scan that feeds CPU-dense per-row kernels
    * (tokenize / n-gram explode / signature passes): a parquet scan's
    * parallelism is bounded by its file SPLITS, and a single-row-group
    * file is one split however many cores the machine has — so every
    * kernel pass upstream of the first exchange runs on ONE core at
    * bench scale. A deliberate NO-OP (df returned untouched, no shuffle
    * added) when the scan already carries ≥ kernel-parallelism
    * partitions, which is every production-sized input — the respread
    * only fires exactly where the starvation exists. Row-to-partition
    * assignment is deterministic under retry (Spark's
    * sortBeforeRepartition, on by default).
    */
  def scan(df: DataFrame): DataFrame = {
    val p = kernelParallelism(df)
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
