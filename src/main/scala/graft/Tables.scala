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
      // The engine-wide `ts` contract is LONG NANOSECONDS ON THE µs GRID:
      // every operator does integer ns math and every oracle runs DuckDB
      // `epoch_ns(ts)` (its TIMESTAMP is µs, so epoch_ns lands on the same
      // grid). Driver-generated fixtures have shipped ts as BOTH parquet
      // TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds, so normalize
      // from whichever representation arrives instead of assuming one.
      //
      // Conf first: a NANOS-written file is rejected by Spark 4's reader
      // unless read as raw longs (`ts` then arrives as LongType ns).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.expr
      import org.apache.spark.sql.types._
      raw.schema("ts").dataType match {
        case LongType =>
          // full-ns values snap to the µs grid: DuckDB's reader floors ns
          // to its µs TIMESTAMP, so differencing/ordering against full-ns
          // flips a bucket or window order whenever sub-µs parts straddle
          // a boundary (caught at sf0.1 on q61's ms buckets).
          // `ts - pmod(ts, 1000)` is FLOOR in exact integer math (pmod's
          // remainder is non-negative), matching DuckDB's floor for
          // pre-1970 negative nanos where `div` would truncate to zero.
          raw.withColumn("ts", expr("ts - pmod(ts, 1000)"))
        case TimestampNTZType | TimestampType =>
          // µs-written fixture: already on the µs clock — widen to the
          // long-ns contract. Session timezone is UTC in every entrypoint
          // (Bench/Verify/Main/specs), so the NTZ→LTZ cast is
          // micros-preserving and unix_micros is exact integer math.
          raw.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
        case other =>
          throw new IllegalStateException(
            s"events.ts arrived as unsupported type $other — fixture format changed?")
      }
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

  /** The canonical location of a build-once derived artifact (ANN/IVF/
    * SQ8/PQ/band/bloom indexes): tmpdir-scoped, keyed by kind + source
    * dir + the source table's [[tableFingerprint]] — so regenerating the
    * fixture flips the path and forces a rebuild instead of silently
    * serving an index computed from the replaced corpus
    * (FixtureRegenSpec drives exactly this). ONE recipe for the six
    * index writers and any spec that needs to predict the path.
    */
  def derivedIndexPath(kind: String, dir: String, table: String): String =
    new java.io.File(
      sys.props("java.io.tmpdir"),
      kind + "_" + dir.replaceAll("[^A-Za-z0-9._-]", "_") +
        "_" + tableFingerprint(dir, table)).getPath
}
