package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spread.byKey: pins the kernel-stage exchange's partition count
  * without adding an exchange, and never changes results.
  */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  test("byKey inserts exactly one exchange for repartition+groupBy") {
    val df = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    val spreadAgg = Spread.byKey(df, col("k")).groupBy(col("k"))
      .agg(sort_array(collect_list(col("v"))).as("vs"))
    // the groupBy's ClusteredDistribution is satisfied by the explicit
    // HashPartitioning — EnsureRequirements must not add a second
    // shuffle on top of the pin
    val exchanges = spreadAgg.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, plan had $exchanges")
  }

  test("byKey leaves aggregation results identical") {
    val df = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy(col("k"))
      .agg(sort_array(collect_list(col("v"))).as("vs"))
    val spreadAgg = Spread.byKey(df, col("k")).groupBy(col("k"))
      .agg(sort_array(collect_list(col("v"))).as("vs"))
    assert(plain.except(spreadAgg).isEmpty && spreadAgg.except(plain).isEmpty)
  }

  test("kernel parallelism derives from the runtime and the conf overrides it") {
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val derived = Spread.kernelParallelism(df)
    assert(derived >= spark.sparkContext.defaultParallelism)
    val prev = spark.conf.getOption(Spread.KERNEL_PARALLELISM_CONF)
    spark.conf.set(Spread.KERNEL_PARALLELISM_CONF, "7")
    try assert(Spread.kernelParallelism(df) == 7)
    finally prev match {
      case Some(v) => spark.conf.set(Spread.KERNEL_PARALLELISM_CONF, v)
      case None => spark.conf.unset(Spread.KERNEL_PARALLELISM_CONF)
    }
  }
}
