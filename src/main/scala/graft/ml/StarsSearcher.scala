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

    // ONE cached fetch feeds the scoring pipeline AND the status base;
    // ONE cached scoring pass feeds the matched sink AND the status join
    // (the dominant cost of a search run is fetch + scoring)
    val fetched = stars.cache()
    val predictions = model.getAllPredictions(fetched).cache()

    val probCols = model.models.map(m => s"prob_${m.name}")
    val passedCols = model.models.map(m => s"passed_${m.name}")
    try {
      // matched-star sink (reference: one FITS per match — here append parquet
      // of the full star rows, the scalable native sink)
      predictions.filter(col("passed"))
        .drop(model.featureCols ++ probCols ++ passedCols: _*)
        .drop("features", "passed")
        .write.mode(SaveMode.Append).parquet(matchedPath)
      // Status notes EVERY queried star (`uploadStatus`, stars_searcher.py:
      // 188-215): stars the NaN-drop removed from the scored set come back
      // found=true / passed=false via the left join, and zero-hit queries
      // record a found=false "Noname" row (`stars_searcher.py:100-105`) so
      // the resume anti-join converges instead of re-running them forever.
      val starBase = fetched.select(col("query_id"), col("starId"),
        lit(true).as("found"),
        (size(col("lightCurves")) > 0 &&
          size(col("lightCurves").getItem(0).getField("mag")) > 0).as("lc"))
      val scored = predictions.select(
        Seq(col("query_id"), col("starId")) ++
          (model.featureCols ++ probCols).map(col) ++
          (passedCols :+ "passed").map(col): _*)
      val perStar = starBase.join(scored, Seq("query_id", "starId"), "left")
      val noHit = todoDf
        .join(starBase.select("query_id").distinct(), Seq("query_id"), "left_anti")
        .select(col("query_id"), lit("Noname").as("starId"),
          lit(false).as("found"), lit(false).as("lc"))
      val status = perStar.unionByName(noHit, allowMissingColumns = true)
        .select(Seq(col("query_id"), col("starId"), col("found"), col("lc")) ++
          (model.featureCols ++ probCols).map(col) ++
          (passedCols :+ "passed").map(c => coalesce(col(c), lit(false)).as(c)): _*)
      status.write.mode(SaveMode.Append).parquet(statusPath)
      status
    } finally { predictions.unpersist(); fetched.unpersist() }
  }
}
