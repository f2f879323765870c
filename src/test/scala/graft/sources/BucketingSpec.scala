package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The co-located-join guarantee: once both sides are bucketed on the join
  * key with the same bucket count, the equi-join plans WITHOUT a shuffle
  * exchange (and with sorted buckets, without a sort) — the layout
  * investment that makes repeated fact-table joins survive 100 TB.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key is exchange-free") {
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("buckets").toString
    Bucketing.writeBucketed(
      Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", 8, s"$dir/li")
    Bucketing.writeBucketed(
      Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
      "ord_bucketed", "o_orderkey", 8, s"$dir/ord")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + p)
      // control: the same join over plain parquet DOES shuffle both sides
      val plain = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
        .join(Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      // and the result is the same either way
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
