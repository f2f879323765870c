package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table persistence — the co-located-join seam for repeated
  * large-×-large joins at 100 TB. Writing both sides bucketed (and
  * sorted) on the join key makes every later equi-join on that key
  * exchange-free: Spark matches the bucket spec at planning time and
  * skips the shuffle (and with sorted buckets, the sort) entirely. This
  * is the standard answer when the same fact-table join runs
  * per-pipeline-stage: pay one shuffle at layout time, never again.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted external parquet table under
    * `path`, registered as `table` in the session catalog. Bucket count
    * should scale with the data (buckets ≈ target partition count at the
    * expected SF) — both join sides must use the same count to co-locate.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
