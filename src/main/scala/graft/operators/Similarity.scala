package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` column):
  * brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH bucketed variant as the 100 TB scale path.
  *
  * Scale notes: brute-force is probe-set × corpus — correct but O(P·N·d);
  * it exists as the verifier. The LSH variant buckets by an 8-bit
  * hyperplane signature so candidate generation is an equi-join on the
  * bucket id (shuffle on a 1-byte key), and only bucket-mates get the full
  * dot product. Hyperplanes are md5-derived, so both engines (and every
  * executor) regenerate identical planes with no driver-side state.
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** (vec_id, pos, v) long form with double-cast values; pos is 1-based to
    * match the DuckDB oracle's list indexing.
    */
  private def longForm(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "vf")))
      .select(col("vec_id"), (col("pos0") + 1).as("pos"), col("vf").cast("double").as("v"))

  /** Brute-force cosine top-5 for probe vectors (vec_id < 20) against the
    * whole corpus.
    */
  def q48CosineKnn(spark: SparkSession, dir: String): DataFrame = {
    val ex = longForm(spark, dir).cache()
    val norms = ex.groupBy(col("vec_id")).agg(sum(col("v") * col("v")).as("nn"))
    val probes = ex.filter(col("vec_id") < 20)
      .select(col("vec_id").as("p_id"), col("pos"), col("v").as("pv"))
    val cands = ex.select(col("vec_id").as("c_id"), col("pos").as("pos2"), col("v").as("cv"))
    val dots = probes.join(cands,
      col("pos") === col("pos2") && col("p_id") =!= col("c_id"))
      .groupBy(col("p_id"), col("c_id"))
      .agg(sum(col("pv") * col("cv")).as("dot"))
    val cos = dots
      .join(norms.toDF("p_id", "np"), Seq("p_id"))
      .join(norms.toDF("c_id", "nc"), Seq("c_id"))
      .withColumn("cosine", round(col("dot") / (sqrt(col("np")) * sqrt(col("nc"))), 6))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cosine").desc, col("c_id"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rn"))
  }

  /** Random-hyperplane LSH: 8 md5-derived planes → 8-bit bucket signature;
    * exact cosine re-rank top-3 within bucket for probes (vec_id < 50).
    */
  def q49AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val ex = longForm(spark, dir)
    // plane weights w(p, pos) ∈ [-1, 1): identical int60 → double on both engines
    val planes = ex
      .withColumn("p", explode(sequence(lit(0), lit(7))))
      .withColumn("w",
        conv(substring(md5(concat(col("p").cast("string"), lit(":"), col("pos").cast("string"))),
          1, 15), 16, 10).cast("long") / lit(576460752303423488L) - 1.0) // 2^59
    val sigs = planes
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("v") * col("w")).as("dot"))
      .withColumn("bit", when(col("dot") > 0, expr("shiftleft(1L, cast(p as int))")).otherwise(0L))
      .groupBy(col("vec_id"))
      .agg(sum(col("bit")).as("bucket"))
    val norms = ex.groupBy(col("vec_id")).agg(sum(col("v") * col("v")).as("nn"))
    val probes = sigs.filter(col("vec_id") < 50).toDF("p_id", "pb")
    val cands = sigs.toDF("c_id", "cb")
    val candPairs = probes.join(cands, col("pb") === col("cb") && col("p_id") =!= col("c_id"))
      .select(col("p_id"), col("c_id"))
    val a = ex.toDF("p_id", "pos", "pv")
    val b = ex.toDF("c_id", "pos", "cv")
    val dots = candPairs
      .join(a, Seq("p_id"))
      .join(b, Seq("c_id", "pos"))
      .groupBy(col("p_id"), col("c_id"))
      .agg(sum(col("pv") * col("cv")).as("dot"))
    val cos = dots
      .join(norms.toDF("p_id", "np"), Seq("p_id"))
      .join(norms.toDF("c_id", "nc"), Seq("c_id"))
      .withColumn("cosine", round(col("dot") / (sqrt(col("np")) * sqrt(col("nc"))), 6))
    val w = Window.partitionBy(col("p_id")).orderBy(col("cosine").desc, col("c_id"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_id"), col("c_id"), col("cosine"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_cosine_knn" -> q48CosineKnn,
    "q49_ann_lsh" -> q49AnnLsh)

  private val longFormCte =
    """e2 AS (
      |  SELECT vec_id, embedding,
      |    unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings),
      |ex AS (
      |  SELECT vec_id, pos, CAST(embedding[pos] AS DOUBLE) AS v FROM e2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q48_cosine_knn" ->
      s"""WITH $longFormCte,
        |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |dots AS (
        |  SELECT a.vec_id AS p_id, b.vec_id AS c_id, sum(a.v * b.v) AS dot
        |  FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id < 20 AND a.vec_id != b.vec_id
        |  GROUP BY 1, 2),
        |cos AS (
        |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
        |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id)
        |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
        |  FROM cos) WHERE rn <= 5""".stripMargin,
    "q49_ann_lsh" ->
      s"""WITH $longFormCte,
        |planes AS (
        |  SELECT ex.*, p,
        |    ('0x' || substr(md5(p || ':' || pos), 1, 15))::BIGINT / 576460752303423488.0 - 1.0 AS w
        |  FROM ex, generate_series(0, 7) g(p)),
        |sigs AS (
        |  SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket FROM (
        |    SELECT vec_id, p,
        |      CASE WHEN sum(v * w) > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END AS bit
        |    FROM planes GROUP BY vec_id, p) GROUP BY vec_id),
        |norms AS (SELECT vec_id, sum(v * v) AS nn FROM ex GROUP BY 1),
        |cand AS (
        |  SELECT x.vec_id AS p_id, y.vec_id AS c_id
        |  FROM sigs x JOIN sigs y ON x.bucket = y.bucket
        |    AND x.vec_id < 50 AND x.vec_id != y.vec_id),
        |dots AS (
        |  SELECT p_id, c_id, sum(a.v * b.v) AS dot
        |  FROM cand JOIN ex a ON a.vec_id = p_id JOIN ex b
        |    ON b.vec_id = c_id AND b.pos = a.pos
        |  GROUP BY 1, 2),
        |cos AS (
        |  SELECT p_id, c_id, round(dot / (sqrt(np.nn) * sqrt(nc.nn)), 6) AS cosine
        |  FROM dots JOIN norms np ON np.vec_id = p_id JOIN norms nc ON nc.vec_id = c_id)
        |SELECT p_id, c_id, cosine, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_id ORDER BY cosine DESC, c_id) AS rn
        |  FROM cos) WHERE rn <= 3""".stripMargin)
}
