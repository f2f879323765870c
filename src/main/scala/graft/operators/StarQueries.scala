package graft.operators

import graft.Tables
import graft.ml._
import graft.model.{LightCurveData, Star}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Star-pipeline operators surfaced as driver queries: the events table is
  * deterministically reshaped into stars (user → star, ts/value → curve) so
  * the descriptor/decider/filter/searcher stack runs against driver data at
  * any scale factor. q50–q53 are hard-oracled ([[KernelOracleSql]] —
  * including the q51/q52 LDA/QDA train-and-score pipeline, which is
  * closed-form deterministic); only q71's PCA mesh stays rows-only
  * (eigenbasis sign/ordering is convention-dependent), pinned by
  * StarsFilterSpec. Exact kernel parity is additionally pinned by the
  * golden specs and decider behavior by the ML specs.
  */
object StarQueries {

  /** events → Dataset[Star]: one star per user, time in days, deterministic
    * class label from the user's dominant event type parity.
    */
  def starsFromEvents(spark: SparkSession, dir: String): Dataset[Star] =
    starsFromEventsDf(spark, Tables.load(spark, dir, "events"))

  /** [[starsFromEvents]] over a caller-supplied events frame (needs
    * user_id, ts, value) — the seam the q184 planted-10× fixture feeds.
    */
  def starsFromEventsDf(spark: SparkSession, events: DataFrame): Dataset[Star] = {
    import spark.implicits._
    // Spread.byKey: everything downstream of this aggregate (Star build,
    // descriptor kernels, decider scoring) is CPU-dense Scala over
    // in-row curves — pin the exchange width or AQE's byte-based
    // coalescing runs it on 1-3 cores at bench scale (see Spread)
    Spread.byKey(events.withColumn("t_days", col("ts") / lit(86400e9)),
        col("user_id"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("t_days").as("t"), col("value").as("v"))))
        .as("pts"))
      .filter(size(col("pts")) > 10)
      .select(col("user_id"), col("pts.t").as("t"), col("pts.v").as("v"))
      .as[(Long, Seq[Double], Seq[Double])]
      .map { case (uid, t, v) =>
        Star(s"user_$uid", None, Map("events" -> uid.toString), Map.empty,
          Map("n_points" -> t.length.toString),
          Some(if (uid % 2 == 0) "searched" else "other"),
          Seq(LightCurveData(t.toArray, v.toArray, Array.fill(t.length)(0.0), Map.empty)))
      }
  }

  private def descriptors = Seq(
    new AbbeValueDescr(bins = Some(50)),
    new SkewnessDescr(),
    new KurtosisDescr(),
    new CurveDensityDescr(),
    new VariogramSlopeDescr(daysPerBin = 1.0))

  /** Descriptor fan-out (feature matrix) over event-derived stars. */
  def q50StarFeatures(spark: SparkSession, dir: String): DataFrame = {
    val stars = starsFromEvents(spark, dir).toDF()
    new StarsFilter(descriptors, Nil).spaceCoordinates(stars)
      .select(col("starId"),
        round(col("abbe_value"), 6).as("abbe_value"),
        round(col("skewness"), 6).as("skewness"),
        round(col("kurtosis"), 6).as("kurtosis"),
        round(col("curve_density"), 6).as("curve_density"),
        round(col("variogram_slope"), 6).as("variogram_slope"))
  }

  /** Full filter train + getAllPredictions over event-derived stars
    * (deterministic closed-form deciders).
    */
  def q51StarClassify(spark: SparkSession, dir: String): DataFrame = {
    // descriptor fan-out ONCE, cached; train + score reuse it
    // (learnOnCoords / predictOnCoords instead of three feature passes)
    val sf = new StarsFilter(descriptors, Seq(new LDADec(), new QDADec()))
    val coords = graft.CacheScope.cache(sf.spaceCoordinates(starsFromEvents(spark, dir).toDF()))
    val model = sf.learnOnCoords(
      coords.filter(col("starClass") === "searched"),
      coords.filter(col("starClass") === "other"))
    model.predictOnCoords(coords)
      .select(col("starId"),
        round(col("prob_LDADec"), 4).as("prob_lda"),
        round(col("prob_QDADec"), 4).as("prob_qda"),
        col("passed_LDADec"), col("passed_QDADec"), col("passed"))
  }

  /** The q184 planted 10× star fixture: 10 deterministic copies of every
    * event row — copy c offsets user_id by c·1,000,000 (even, so the
    * parity-derived class label is preserved) and perturbs value by
    * c/1024 (an exact binary fraction: both engines' doubles are
    * bit-identical). The amplification is PART OF THE QUERY, mirrored in
    * the oracle's events_amp CTE, so the gate certifies the classify
    * chain at 10× the fixture's stars — the StarLadderBench 10× rung
    * promoted to a hash gate the way q178/q179 promoted their dials.
    */
  private def amplifiedEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .crossJoin(spark.range(0, 10).select(col("id").as("copy")))
      .select(
        (col("user_id") + lit(1000000L) * col("copy")).as("user_id"),
        col("ts"),
        (col("value") + col("copy") / lit(1024.0)).as("value"))

  /** q51's full train-and-score chain at the planted 10× star fixture
    * (see [[amplifiedEvents]]); output contract identical to q51.
    */
  def q184StarClassify10x(spark: SparkSession, dir: String): DataFrame = {
    val sf = new StarsFilter(descriptors, Seq(new LDADec(), new QDADec()))
    val coords = graft.CacheScope.cache(sf.spaceCoordinates(
      starsFromEventsDf(spark, amplifiedEvents(spark, dir)).toDF()))
    val model = sf.learnOnCoords(
      coords.filter(col("starClass") === "searched"),
      coords.filter(col("starClass") === "other"))
    model.predictOnCoords(coords)
      .select(col("starId"),
        round(col("prob_LDADec"), 4).as("prob_lda"),
        round(col("prob_QDADec"), 4).as("prob_qda"),
        col("passed_LDADec"), col("passed_QDADec"), col("passed"))
  }

  /** Filter statistics (confusion metrics + mean row) for the trained
    * filter — the reference's `getStatistic` surface.
    */
  def q52StarStatistic(spark: SparkSession, dir: String): DataFrame = {
    // one cached descriptor pass feeds training AND the confusion stats
    val sf = new StarsFilter(descriptors, Seq(new LDADec(), new QDADec()))
    val coords = graft.CacheScope.cache(sf.spaceCoordinates(starsFromEvents(spark, dir).toDF()))
    val sCoords = coords.filter(col("starClass") === "searched")
    val oCoords = coords.filter(col("starClass") === "other")
    val model = sf.learnOnCoords(sCoords, oCoords)
    model.getStatisticOnCoords(sCoords, oCoords)
  }

  /** Comparative SAX descriptor over event-derived stars: dissimilarity of
    * every star from the first three stars as templates (broadcast
    * nested-loop compare + aggregate).
    */
  def q53StarComparative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // cached: the template collect and the transform both consume it
    val stars = graft.CacheScope.cache(starsFromEvents(spark, dir))
    val templates = stars.orderBy("starId").limit(3).collect().toSeq
      .map(s => (s.lightCurves.head.time, s.lightCurves.head.mag))
    val descr = new HistShapeDescr(templates, bins = 10, alphabetSize = 7)
    descr.transform(stars.toDF())
      .select(col("starId"), round(col("hist_shape_dissim"), 6).as("hist_dissim"))
  }

  /** N-D probability space (`plotNDProbabSpace`): PCA-plane meshgrid,
    * inverse-transformed and scored by the trained deciders. Hard-oracled
    * since r9: the PCA basis is sign-canonicalized (StarsFilter), so the
    * SQL oracle's power-iteration eigenvectors reproduce the mesh exactly;
    * grid geometry and scoring are additionally pinned by StarsFilterSpec.
    */
  def q71StarProbspace(spark: SparkSession, dir: String): DataFrame = {
    // ONE descriptor pass feeds training and the PCA mesh — CHECKPOINTED,
    // not cached: training's driver-side collects are several sequential
    // actions, and each re-paid plan canonicalization over the whole
    // star-build + descriptor tree when this was a cache (the q155/q104
    // lesson; measured ~1.4 s of driver-idle wall here at sf0.1)
    val sf = new StarsFilter(descriptors, Seq(new LDADec(), new QDADec()))
    val coords = graft.GraftCheckpoint.stage(
      sf.spaceCoordinates(starsFromEvents(spark, dir).toDF()), "q71_coords")
    val sCoords = coords.filter(col("starClass") === "searched")
    val oCoords = coords.filter(col("starClass") =!= "searched")
    val model = sf.learnOnCoords(sCoords, oCoords)
    model.probabilitySpaceNDOnCoords(sCoords, oCoords, gridPerDim = 20)
      .select(round(col("x"), 6).as("x"), round(col("y"), 6).as("y"),
        round(col("prob_LDADec"), 4).as("prob_lda"),
        round(col("prob_QDADec"), 4).as("prob_qda"),
        col("combined_prob"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_star_features" -> q50StarFeatures,
    "q51_star_classify" -> q51StarClassify,
    "q52_star_statistic" -> q52StarStatistic,
    "q53_star_comparative" -> q53StarComparative,
    "q71_star_probspace" -> q71StarProbspace,
    "q184_star_classify_10x" -> q184StarClassify10x)

  /** EVERY star query is hard-oracled ([[KernelOracleSql]]): q50 features,
    * q53 comparative SAX, the q51/q52 LDA/QDA train-and-score pipeline
    * (5×5 Cholesky over per-class moment sums), and — since the Scala
    * side canonicalizes PCA component signs — q71's PCA-plane mesh (power
    * iteration on the gapped covariance spectrum, deflation for the
    * second component, mesh + inverse transform + model scoring in SQL).
    */
  val oracleSql: Map[String, String] = Map(
    "q50_star_features" -> KernelOracleSql.q50Sql,
    "q51_star_classify" -> KernelOracleSql.q51Sql,
    "q52_star_statistic" -> KernelOracleSql.q52Sql,
    "q53_star_comparative" -> KernelOracleSql.q53Sql,
    "q71_star_probspace" -> KernelOracleSql.q71Sql,
    "q184_star_classify_10x" -> KernelOracleSql.q184Sql)
}
