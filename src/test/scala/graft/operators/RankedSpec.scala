package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared two-phase ranked take (q86/q63/q75's kernel): output must
  * equal the single-window reference and be INDEPENDENT of the input's
  * physical partitioning — the property that makes the local phase's
  * spark_partition_id key safe (a global winner is a local winner under
  * any distribution of rows to partitions).
  */
class RankedSpec extends SparkSpec {
  import spark.implicits._

  test("twoPhaseTopK equals the single-window take under every partitioning") {
    val rng = new scala.util.Random(13)
    val rows = Seq.tabulate(600) { i =>
      (i.toLong, s"k${rng.nextInt(3)}", rng.nextInt(1000))
    }
    val df = rows.toDF("id", "key", "ord")
    val ref = {
      val w = Window.partitionBy(col("key")).orderBy(col("ord"), col("id"))
      df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 7)
        .select("id", "key", "rk").as[(Long, String, Int)].collect().toSet
    }
    for (parts <- Seq(1, 3, 8, 32)) {
      val got = Ranked.twoPhaseTopK(df.repartition(parts),
        Seq(col("key")), Seq(col("ord"), col("id")), lit(7))
        .select("id", "key", "rk").as[(Long, String, Int)].collect().toSet
      assert(got == ref, s"two-phase take diverged at $parts partitions")
    }
    // per-row quota column (the q75 shape): quota varies by key
    val quota = Seq(("k0", 3), ("k1", 9), ("k2", 1)).toDF("key", "q")
    val refQ = {
      val w = Window.partitionBy(col("key")).orderBy(col("ord"), col("id"))
      df.join(broadcast(quota), Seq("key"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= col("q"))
        .select("id", "key", "rk").as[(Long, String, Int)].collect().toSet
    }
    for (parts <- Seq(2, 16)) {
      val got = Ranked.twoPhaseTopK(
        df.repartition(parts).join(broadcast(quota), Seq("key")),
        Seq(col("key")), Seq(col("ord"), col("id")), col("q"))
        .select("id", "key", "rk").as[(Long, String, Int)].collect().toSet
      assert(got == refQ, s"quota-column take diverged at $parts partitions")
    }
  }
}
