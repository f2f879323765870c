package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: benchmark decontamination, repetition-based
  * quality filtering (the Gopher-rule family), and sequence packing.
  *
  * Scale notes are per-operator; the common theme is that the only wide
  * exchanges are (a) the broadcast of a small eval-set gram table and
  * (b) per-lang windows — nothing global, nothing all-pairs.
  */
object CorpusOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** Benchmark decontamination: flag every training document sharing at
    * least one token 8-gram with the eval set (`source = 'src0'` stands in
    * for the benchmark corpus). The eval side is tiny by construction, so
    * its distinct gram set BROADCASTS and contamination is a map-side
    * broadcast join on the training side — the 100 TB shape (the training
    * corpus never shuffles; the gram explode pipelines into the join
    * inside one stage). Distinct-per-doc grams keep `n_hits` = number of
    * distinct shared grams.
    */
  def q68Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("tokens", split(col("text"), " "))
    def grams(df: DataFrame): DataFrame = df
      .filter(size(col("tokens")) >= 8)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("tokens")) - 7),
          i => array_join(slice(col("tokens"), i, lit(8)), " ")))).as("gram"))
    val evalGrams = grams(d.filter(col("source") === "src0"))
      .select(col("gram")).distinct()
    val hits = grams(d.filter(col("source") =!= "src0"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    d.filter(col("source") =!= "src0")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Repetition-based quality scoring (the Gopher-rule family): fraction
    * of the document covered by its most frequent token, and the fraction
    * of duplicate 2-grams. Both are in-row array expressions — a narrow
    * per-row projection with NO shuffle, so the filter pipelines inside
    * the scan's codegen stage at any corpus size. The per-row cost is
    * O(distinct·n) for the mode, bounded by document length.
    */
  /** Per-row repetition scores over a frame with a `text` column — shared
    * by q69 and the spec's constructed-input checks.
    */
  private[operators] def repetitionScores(df: DataFrame): DataFrame =
    df.withColumn("tokens", split(col("text"), " "))
      .withColumn("n_tok", size(col("tokens")))
      .withColumn("top_tok_frac", round(
        array_max(transform(array_distinct(col("tokens")),
          t => size(filter(col("tokens"), x => x === t)))).cast("double")
          / col("n_tok"), 6))
      // sequence(1, 0) is DESCENDING [1, 0], not empty — guard 1-token docs
      .withColumn("bigrams", expr(
        """CASE WHEN size(tokens) > 1
          |  THEN transform(sequence(1, size(tokens) - 1),
          |         i -> concat_ws(' ', tokens[i - 1], tokens[i]))
          |  ELSE array() END""".stripMargin))
      .withColumn("dup_bigram_frac", round(
        when(size(col("bigrams")) > 0,
          (size(col("bigrams")) - size(array_distinct(col("bigrams")))).cast("double")
            / size(col("bigrams"))).otherwise(lit(0.0)), 6))
      .select(col("doc_id"), col("n_tok"), col("top_tok_frac"), col("dup_bigram_frac"),
        (col("top_tok_frac") > 0.3 || col("dup_bigram_frac") > 0.3).as("flagged"))

  def q69Repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionScores(docs(spark, dir))

  /** Sequence packing: concat-and-chunk documents into 2048-token training
    * windows WITHIN each language (the monolingual-stream shape). The only
    * exchange is the per-lang window — languages pack in parallel and no
    * global order exists, so the operator scales with executor count
    * rather than forcing a single-partition global cumsum. Emits each
    * document's stream offset, window id, and whether it straddles a
    * window boundary (the span that would be attention-masked).
    */
  def q70PackSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .withColumn("n_tok", size(split(col("text"), " ")))
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .withColumn("start_off", col("cum_end") - col("n_tok"))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        col("start_off"),
        floor(col("start_off") / 2048).as("seq_id"),
        (floor(col("start_off") / 2048) =!=
          floor((col("cum_end") - 1) / 2048)).as("crosses_boundary"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_decontaminate" -> q68Decontaminate,
    "q69_repetition" -> q69Repetition,
    "q70_pack_sequences" -> q70PackSequences)

  val oracleSql: Map[String, String] = Map(
    "q68_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT DISTINCT doc_id, source,
        |    unnest(list_transform(range(1, len(toks) - 6),
        |      i -> array_to_string(toks[i:i+7], ' '))) AS gram
        |  FROM t WHERE len(toks) >= 8),
        |ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |hits AS (
        |  SELECT g.doc_id, count(*) AS n_hits
        |  FROM g JOIN ev USING (gram) WHERE g.source != 'src0' GROUP BY 1)
        |SELECT t.doc_id, coalesce(hits.n_hits, 0) AS n_hits,
        |  coalesce(hits.n_hits, 0) > 0 AS contaminated
        |FROM t LEFT JOIN hits ON t.doc_id = hits.doc_id
        |WHERE t.source != 'src0'""".stripMargin,
    "q69_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, len(toks) AS n_tok,
        |    round(CAST(list_max(list_transform(list_distinct(toks),
        |      t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / len(toks), 6)
        |      AS top_tok_frac,
        |    CASE WHEN len(toks) > 1 THEN round(
        |      CAST(len(toks) - 1 - len(list_distinct(list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) / (len(toks) - 1), 6)
        |      ELSE 0.0 END AS dup_bigram_frac
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS INT) AS n_tok, top_tok_frac, dup_bigram_frac,
        |  (top_tok_frac > 0.3 OR dup_bigram_frac > 0.3) AS flagged
        |FROM s""".stripMargin,
    "q70_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tok,
        |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
        |  FROM t)
        |SELECT doc_id, lang, CAST(n_tok AS INT) AS n_tok,
        |  CAST(cum_end - n_tok AS BIGINT) AS start_off,
        |  CAST((cum_end - n_tok) // 2048 AS BIGINT) AS seq_id,
        |  ((cum_end - n_tok) // 2048) != ((cum_end - 1) // 2048) AS crosses_boundary
        |FROM c""".stripMargin)
}
