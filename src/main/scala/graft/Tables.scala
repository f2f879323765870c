package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor dir. Loading is
  * plain `spark.read.parquet` so Catalyst gets full pushdown/pruning; we
  * additionally register each as a temp view so `spark.sql` queries work
  * against the same names DuckDB uses in the oracle.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.parquet stores TIMESTAMP(NANOS) which Spark 4 rejects unless
      // read as raw nanos; `ts` therefore arrives as LongType nanoseconds
      // (DuckDB oracle equivalent: epoch_ns(ts)).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register all tables of a scale-factor dir as temp views. Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
