package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hyperparameter grid search (SURVEY §2.10, `tools/params_estim.py:15-326`):
  * deterministic shuffled train/test split, per-combination fit + statistic
  * on the test sample, argmax of the score column.
  *
  * The reference parallelizes combinations with a process pool
  * (`params_estim.py:117-136`); here each fit is data-parallel on the
  * cluster AND combinations are submitted concurrently from a bounded
  * driver pool — the `TrainValidationSplit(parallelism)` trade. Spark's
  * scheduler interleaves the concurrent jobs across executors, which
  * matters because small fits are scheduling-latency-bound, not data-bound.
  * Combinations must not share stateful descriptor instances (e.g. the
  * same fitted `CurveDescr`) across entries.
  */
final case class TuneCombination(
    label: String,
    descriptors: Seq[Descriptor],
    deciders: Seq[Decider])

final case class TuneResult(
    label: String,
    model: StarsFilterModel,
    stats: Map[String, Double])

class ParamsEstimator(
    searched: DataFrame,
    others: DataFrame,
    combinations: Seq[TuneCombination],
    splitRatio: Double = 0.75,
    seed: Long = 42L,
    parallelism: Int = 4) {

  require(combinations.nonEmpty, "no combinations to tune")

  /** Deterministic shuffle + split (`params_estim.py:80-86`; seedable per
    * survey §7.5.10).
    */
  private def split(df: DataFrame): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(splitRatio, 1 - splitRatio), seed)
    (train, test)
  }

  /** Fit every combination, score on the held-out sample, return all results
    * plus the argmax (`fit` + `evaluateCombinations`,
    * `params_estim.py:146-260`).
    */
  def fit(score: String = "precision"): (TuneResult, Seq[TuneResult]) = {
    val (sTrain, sTest) = split(searched)
    val (oTrain, oTest) = split(others)
    sTrain.cache(); sTest.cache(); oTrain.cache(); oTest.cache()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, combinations.length)))
    try {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // one future per combination — Spark accepts concurrent job
      // submissions from driver threads and interleaves their stages
      val futures = combinations.map { c =>
        Future {
          val model = new StarsFilter(c.descriptors, c.deciders).learn(sTrain, oTrain)
          val statRow = model.getStatistic(sTest, oTest)
            .filter(col("decider") === "mean")
            .head()
          val stats = statRow.schema.fieldNames.filter(_ != "decider")
            .map(f => f -> statRow.getAs[Double](f)).toMap
          TuneResult(c.label, model, stats)
        }
      }
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      val best = results.maxBy(_.stats.getOrElse(score, Double.NegativeInfinity))
      (best, results)
    } finally {
      pool.shutdown()
      sTrain.unpersist(); sTest.unpersist(); oTrain.unpersist(); oTest.unpersist()
    }
  }
}
