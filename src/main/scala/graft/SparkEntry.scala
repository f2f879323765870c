package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2) re-expressed over the
  * driver test tables; `oracleSql` holds the DuckDB-equivalent SQL for the
  * correctness gate. Column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (the star pipeline: events →
    * stars → descriptor features); driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.StarQueries.q50StarFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Dedup.queries ++
      operators.TextAnalysis.queries ++
      operators.Similarity.queries ++
      operators.TimeSeries.queries ++
      operators.StarQueries.queries ++
      operators.Multimodal.queries ++
      operators.CorpusOps.queries ++
      operators.BloomGate.queries ++
      operators.Spatial.queries ++
      operators.Bm25.queries ++
      CorpusBuild.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++
      operators.Dedup.oracleSql ++
      operators.TextAnalysis.oracleSql ++
      operators.Similarity.oracleSql ++
      operators.TimeSeries.oracleSql ++
      operators.StarQueries.oracleSql ++
      operators.Multimodal.oracleSql ++
      operators.CorpusOps.oracleSql ++
      operators.BloomGate.oracleSql ++
      operators.Spatial.oracleSql ++
      operators.Bm25.oracleSql ++
      CorpusBuild.oracleSql
}
