package graft.ml

import graft.sources.{QuerySpec, StarsProvider}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Systematic filtered search (SURVEY §2.10 + §3.1,
  * `systematic_search/stars_searcher.py:63-234`): a query table drives the
  * source, every fetched star runs through the trained filter, matches go
  * to the matched-star sink and every star's probabilities go to the
  * append-mode status sink.
  *
  * Spark restatement of the reference's sequential per-query loop: ONE job —
  * queries are unioned into a single source scan (partition = query), the
  * pipeline transforms once, both sinks write append-mode parquet. The
  * reference's Redis work queue (`stars_searcher.py:267-346`) is subsumed by
  * partition parallelism; its status-file resume (`getUnsearchedQuery`,
  * `status_resolver.py:53-76`) is the left_anti join in [[unsearchedQueries]].
  */
class StarsSearcher(
    model: StarsFilterModel,
    connectorName: String,
    matchedPath: String,
    statusPath: String) {

  /** Resume support: queries minus those already present in the status sink
    * (anti join on the query id).
    */
  def unsearchedQueries(spark: SparkSession, queries: DataFrame): DataFrame = {
    val done =
      try spark.read.parquet(statusPath).select(col("query_id")).distinct()
      catch { case _: Exception => return queries } // no status yet
    queries.join(done, Seq("query_id"), "left_anti")
  }

  /** Run the search for a query table with columns `query_id` + connector
    * params (as a map column `params`). Returns the status DataFrame.
    */
  def queryStars(spark: SparkSession, queries: DataFrame): DataFrame = {
    import spark.implicits._
    val todoDf = unsearchedQueries(spark, queries)
      .select(col("query_id"), col("params"))
    val connector = StarsProvider.getProvider(connectorName)
    val stars = connector match {
      // scale path: one source scan joined against the broadcast query
      // table — no driver loop, no N-way union plan
      case ac: graft.sources.ArchiveConnector
          if ac.supportsJoinedFetch(todoDf
            .select(explode(map_keys(col("params")))).distinct().as[String]
            .collect().toSet) =>
        if (todoDf.isEmpty) return spark.emptyDataFrame
        ac.getStarsJoined(spark, todoDf)
      case _ =>
        // path-driven connectors: the query table is config-sized, so
        // collecting it is bounded driver state — the scan is what matters
        val todo = todoDf.as[(String, Map[String, String])].collect().toSeq
        if (todo.isEmpty) return spark.emptyDataFrame
        connector match {
          // .dat directories with explicit star lists: ONE DataSource V2
          // scan with starId IN pushdown (planning-time file pruning)
          // joined to the broadcast query table — no N-way union plan
          case fm: graft.sources.FileManagerConnector
              if graft.sources.FileManagerConnector.datRoutable(todo) =>
            fm.getStarsDatJoined(spark, todo)
          case _ =>
            todo.map { case (qid, params) =>
              connector.getStars(spark, Seq(QuerySpec(params)))
                .toDF()
                .withColumn("query_id", lit(qid))
            }.reduce(_ unionByName _)
        }
    }

    val predictions = model.getAllPredictions(stars)
      .withColumn("found", lit(true))
      .withColumn("lc", size(col("lightCurves")) > 0)

    val statusCols = Seq(col("query_id"), col("starId"), col("found"), col("lc")) ++
      model.featureCols.map(col) ++
      model.models.map(m => col(s"prob_${m.name}")) ++
      model.models.map(m => col(s"passed_${m.name}")) :+ col("passed")

    val status = predictions.select(statusCols: _*).cache()
    try {
      // matched-star sink (reference: one FITS per match — here append parquet
      // of the full star rows, the scalable native sink)
      predictions.filter(col("passed"))
        .drop(model.featureCols ++ model.models.flatMap(m =>
          Seq(s"prob_${m.name}", s"passed_${m.name}")): _*)
        .drop("features", "passed")
        .write.mode(SaveMode.Append).parquet(matchedPath)
      // status sink (`uploadStatus`, stars_searcher.py:188-215)
      status.write.mode(SaveMode.Append).parquet(statusPath)
      status
    } finally status.unpersist()
  }
}
