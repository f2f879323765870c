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
      // read as raw nanos; `ts` therefore arrives as LongType nanoseconds.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // …then snapped to the MICROSECOND grid: DuckDB's parquet reader
      // floors ns timestamps to µs (its TIMESTAMP type), so any oracle
      // time math runs on the µs clock. Differencing/ordering full-ns
      // values against µs-floored ones flips a bucket or a window order
      // whenever the sub-µs parts straddle a boundary (caught at sf0.1 on
      // q61's ms buckets) — one clock for both engines removes the class.
      // `ts - pmod(ts, 1000)` is FLOOR division in exact integer math
      // (pmod's remainder is non-negative), matching DuckDB's floor for
      // pre-1970 negative nanos where `div` would truncate toward zero.
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("ts - pmod(ts, 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register all tables of a scale-factor dir as temp views. Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }

  /** Cheap content fingerprint of one table's parquet path — used to key
    * build-once derived artifacts (the q81/q82/q83 materialized indexes) so
    * a REGENERATED fixture invalidates the cached index instead of silently
    * serving results computed from the old corpus. Goes through the path's
    * Hadoop FileSystem (java.io.File length/mtime is meaningless for
    * directory-style parquet outputs and non-local hdfs://, s3a:// dirs)
    * and folds every data file's (path, length, mtime) in sorted order.
    * Metadata-only; no Spark job.
    */
  def tableFingerprint(sfDir: String, name: String): String = {
    val path = new org.apache.hadoop.fs.Path(s"$sfDir/$name.parquet")
    val fs = path.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf())
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val s = it.next()
      files += ((s.getPath.toUri.getPath, s.getLen, s.getModificationTime))
    }
    val h = files.sortBy(_._1).foldLeft(1125899906842597L) { case (acc, (p, len, mt)) =>
      ((acc * 31 + p.hashCode) * 31 + len) * 31 + mt
    }
    java.lang.Long.toHexString(h)
  }
}
