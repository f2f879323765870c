package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`: exact (hash-groupBy),
  * MinHash+LSH (shingle → minhash → band → bucket join), word-n-gram
  * Jaccard, and SimHash — the training-data-pipeline dedup suite. All four
  * are fully oracle-checked: hashing is md5-derived so both engines compute
  * identical integers.
  *
  * Scale notes: exact dedup is one shuffle on the content hash. MinHash-LSH
  * is the scale path for near-dup — candidate generation joins on band
  * signature (tiny keys), never all-pairs; the n-gram Jaccard join is
  * bucket-limited (lang, source) and exists as the exact verifier the LSH
  * candidates feed at 100 TB. Nothing here collects to the driver.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Exact dedup: canonical = min doc_id per content hash. */
  def q44DedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Word-3-gram shingles per doc, distinct. */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("tok", split(col("text"), " "))
      .withColumn("shingle", explode(transform(
        sequence(lit(1), size(col("tok")) - 2),
        i => concat_ws(" ", element_at(col("tok"), i),
          element_at(col("tok"), i + 1), element_at(col("tok"), i + 2)))))
      .select(col("doc_id"), col("lang"), col("source"), col("shingle"))
      .distinct()

  /** N-gram Jaccard near-dup within (lang, source) buckets: pair overlap via
    * shingle equi-join, jaccard = |∩| / |∪|, threshold 0.5.
    */
  def q45NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir).cache()
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("lang"), col("source"), col("shingle"))
    val b = sh.select(col("doc_id").as("b_id"), col("lang").as("l2"),
      col("source").as("s2"), col("shingle").as("sh2"))
    val inter = a.join(b,
      col("shingle") === col("sh2") && col("lang") === col("l2") &&
        col("source") === col("s2") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
      .join(counts.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
  }

  /** MinHash signature: 16 hash functions h_k(s) = int60(md5(k ':' s)),
    * identical integers on both engines.
    */
  private def minhashSig(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir)
      .withColumn("k", explode(sequence(lit(0), lit(15))))
      .withColumn("h", conv(substring(
        md5(concat(col("k").cast("string"), lit(":"), col("shingle"))), 1, 15), 16, 10)
        .cast("long"))
      .groupBy(col("doc_id"), col("k"))
      .agg(min(col("h")).as("mh"))

  /** MinHash + LSH banding: 4 bands × 4 rows; candidates share a band;
    * estimated similarity = matching minhashes / 16; threshold 0.5.
    */
  def q46MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSig(spark, dir).cache()
    // band signature: 4 rows per band, pivoted deterministically by k%4
    val bands = sig
      .withColumn("band", floor(col("k") / 4))
      .groupBy(col("doc_id"), col("band"))
      .agg(
        max(when(col("k") % 4 === 0, col("mh"))).as("m0"),
        max(when(col("k") % 4 === 1, col("mh"))).as("m1"),
        max(when(col("k") % 4 === 2, col("mh"))).as("m2"),
        max(when(col("k") % 4 === 3, col("mh"))).as("m3"))
    val cand = bands.alias("x").join(bands.alias("y"),
      col("x.band") === col("y.band") &&
        col("x.m0") === col("y.m0") && col("x.m1") === col("y.m1") &&
        col("x.m2") === col("y.m2") && col("x.m3") === col("y.m3") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val est = cand
      .join(sig.toDF("a_id", "k", "mha"), Seq("a_id"))
      .join(sig.toDF("b_id", "kb", "mhb"), Seq("b_id"))
      .filter(col("k") === col("kb"))
      .groupBy(col("a_id"), col("b_id"))
      .agg((sum(when(col("mha") === col("mhb"), 1).otherwise(0)) / 16.0).as("est_sim"))
    est.filter(col("est_sim") >= 0.5)
      .select(col("a_id"), col("b_id"), col("est_sim"))
  }

  /** SimHash (16-bit, token-level): bit j votes by token-hash bit; near-dup
    * pairs = same lang, hamming distance ≤ 2.
    */
  def q47Simhash(spark: SparkSession, dir: String): DataFrame = {
    val tokenHash = docs(spark, dir)
      .withColumn("token", explode(split(col("text"), " ")))
      .withColumn("h", conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"))
    val bits = tokenHash
      .withColumn("j", explode(sequence(lit(0), lit(15))))
      // integer shift, not double division — h has 60 bits (> double mantissa)
      .withColumn("bit", expr("shiftright(h, cast(j as int)) % 2"))
      .groupBy(col("doc_id"), col("lang"), col("j"))
      .agg(sum(col("bit") * 2 - 1).as("vote"))
    val sim = bits
      .withColumn("bitval",
        when(col("vote") > 0, pow(lit(2), col("j")).cast("long")).otherwise(0L))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("bitval")).as("simhash"))
    val pairs = sim.alias("x").join(sim.alias("y"),
      col("x.lang") === col("y.lang") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.simhash").as("ha"), col("y.simhash").as("hb"))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= 2)
    pairs.select(col("a_id"), col("b_id"), col("ha"), col("hb"), col("hamming"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_dedup_exact" -> q44DedupExact,
    "q45_ngram_jaccard" -> q45NgramJaccard,
    "q46_minhash_lsh" -> q46MinhashLsh,
    "q47_simhash" -> q47Simhash)

  private val shingleCte =
    """t AS (SELECT doc_id, lang, source, string_split(text, ' ') AS tok FROM documents),
      |idx AS (
      |  SELECT doc_id, lang, source, tok,
      |    unnest(generate_series(1, len(tok) - 2)) AS i
      |  FROM t),
      |sh AS (
      |  SELECT DISTINCT doc_id, lang, source,
      |    tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS shingle
      |  FROM idx)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q44_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "q45_ngram_jaccard" ->
      s"""WITH $shingleCte,
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
        |    AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, inter,
        |  CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |FROM inter JOIN cnt ca ON a_id = ca.doc_id JOIN cnt cb ON b_id = cb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5""".stripMargin,
    "q46_minhash_lsh" ->
      s"""WITH $shingleCte,
        |sig AS (
        |  SELECT doc_id, k,
        |    min(('0x' || substr(md5(k || ':' || shingle), 1, 15))::BIGINT) AS mh
        |  FROM sh, generate_series(0, 15) g(k)
        |  GROUP BY doc_id, k),
        |bands AS (
        |  SELECT doc_id, k // 4 AS band,
        |    max(CASE WHEN k % 4 = 0 THEN mh END) AS m0,
        |    max(CASE WHEN k % 4 = 1 THEN mh END) AS m1,
        |    max(CASE WHEN k % 4 = 2 THEN mh END) AS m2,
        |    max(CASE WHEN k % 4 = 3 THEN mh END) AS m3
        |  FROM sig GROUP BY doc_id, band),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
        |  FROM bands x JOIN bands y ON x.band = y.band AND x.m0 = y.m0
        |    AND x.m1 = y.m1 AND x.m2 = y.m2 AND x.m3 = y.m3
        |    AND x.doc_id < y.doc_id)
        |SELECT a_id, b_id,
        |  sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 16.0 AS est_sim
        |FROM cand JOIN sig sa ON sa.doc_id = a_id JOIN sig sb
        |  ON sb.doc_id = b_id AND sb.k = sa.k
        |GROUP BY a_id, b_id
        |HAVING sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 16.0 >= 0.5""".stripMargin,
    "q47_simhash" ->
      """WITH th AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 15))::BIGINT AS h
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, lang, j, sum(((h // CAST(pow(2, j) AS BIGINT)) % 2) * 2 - 1) AS vote
        |  FROM th, generate_series(0, 15) g(j)
        |  GROUP BY doc_id, lang, j),
        |sim AS (
        |  SELECT doc_id, lang,
        |    CAST(sum(CASE WHEN vote > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id, lang)
        |SELECT x.doc_id AS a_id, y.doc_id AS b_id, x.simhash AS ha, y.simhash AS hb,
        |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
        |FROM sim x JOIN sim y ON x.lang = y.lang AND x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.simhash, y.simhash)) <= 2""".stripMargin)
}
