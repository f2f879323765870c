package graft.streaming

import graft.SparkSpec
import graft.operators.{CorpusOps, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The composed ingest pipeline the gate docs promise, exercised end to
  * end: Gopher rule gate → repetition quality gate → stateful exact
  * dedup, each stage a REAL streaming query reading the previous stage's
  * sink (no in-memory shortcut), across two arrivals with
  * checkpoint-restart replay and the dedup state-size law asserted from
  * the engine's own metrics.
  */
class ComposedIngestSpec extends SparkSpec {

  // 55 distinct 4-7-letter-ish words + 2 stopwords: passes every Gopher
  // rule (wc 57, mean len in [3,10], all alpha, 2 distinct stopwords)
  // and stays unflagged by repetition (all bigrams distinct)
  private def prose(k: Int): String =
    "the and " + (1 to 55).map(i => s"word$k" + ('a' + i % 26).toChar + i).mkString(" ")

  // Gopher-passing but repetition-FLAGGED: dup_bigram_frac ≈ 1 > 0.3
  private def loopy(k: Int): String =
    "the and " + (s"loop$k cycle$k " * 30).trim

  // Gopher-failing keyword soup: zero stopwords
  private def soup(k: Int): String = (s"data$k table row " * 20).trim

  private def toDocs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def sinkSchemaMinusBatch(path: String): StructType =
    StructType(spark.read.parquet(path).schema.fields
      .filterNot(_.name == "batch_id"))

  private def readIds(path: String): Set[Long] =
    if (!new java.io.File(path).exists()) Set.empty
    else spark.read.parquet(path).select("doc_id").collect()
      .map(_.getLong(0)).toSet

  test("gopher -> quality -> dedup composes over sinks; restart replays clean") {
    val tmp = java.nio.file.Files.createTempDirectory("composed").toString
    val arrival1 = // 6 clean survivors, 2 repetitive, 2 soup
      (1L to 6L).map(i => i -> prose(i.toInt)) ++
        Seq(7L -> loopy(7), 8L -> loopy(8), 9L -> soup(9), 10L -> soup(10))
    val arrival2 = // 3 new survivors + 2 exact dups of arrival-1 survivors
      (11L to 13L).map(i => i -> prose(i.toInt)) ++
        Seq(14L -> prose(1), 15L -> prose(2))
    val docSchema = toDocs(arrival1).schema

    // one pipeline pass: each stage drains what the previous stage has
    // sunk so far (AvailableNow), with persistent checkpoints
    def runPipeline(): org.apache.spark.sql.streaming.StreamingQuery = {
      StreamingGopherGate.run(spark, s"$tmp/in", docSchema,
        s"$tmp/gopher_pass", s"$tmp/gopher_reject", s"$tmp/ckpt_gopher")
        .awaitTermination()
      StreamingQuality.run(spark, s"$tmp/gopher_pass",
        sinkSchemaMinusBatch(s"$tmp/gopher_pass"),
        s"$tmp/clean", s"$tmp/rep_reject", s"$tmp/ckpt_quality")
        .awaitTermination()
      val dq = StreamingDedup.run(spark, s"$tmp/clean",
        sinkSchemaMinusBatch(s"$tmp/clean"),
        s"$tmp/final", s"$tmp/ckpt_dedup")
      dq.awaitTermination()
      dq
    }

    toDocs(arrival1).write.mode("append").parquet(s"$tmp/in")
    runPipeline()
    assert(readIds(s"$tmp/final") == (1L to 6L).toSet,
      s"arrival 1 survivors wrong: ${readIds(s"$tmp/final")}")
    assert(readIds(s"$tmp/gopher_reject") == Set(9L, 10L))
    assert(readIds(s"$tmp/rep_reject") == Set(7L, 8L))

    toDocs(arrival2).write.mode("append").parquet(s"$tmp/in")
    val dq2 = runPipeline()
    // dups of arrival-1 survivors (14, 15) are dropped by dedup STATE
    // across arrivals; the other stages pass them (they are clean prose)
    assert(readIds(s"$tmp/final") == ((1L to 6L) ++ (11L to 13L)).toSet,
      s"cross-arrival dedup wrong: ${readIds(s"$tmp/final")}")
    assert(readIds(s"$tmp/gopher_reject") == Set(9L, 10L))
    assert(readIds(s"$tmp/rep_reject") == Set(7L, 8L))
    // the payload survives the whole pipeline byte-exact
    val gotTexts = spark.read.parquet(s"$tmp/final")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotTexts(11L) == prose(11))
    // state-size law from the engine's own metrics: one state row per
    // DISTINCT content hash the dedup has seen within the watermark
    // (9 distinct survivor texts reached it; the 2 dups added none)
    val stateRows = dq2.recentProgress.flatMap(_.stateOperators)
      .map(_.numRowsTotal).lastOption.getOrElse(-1L)
    assert(stateRows == 9L,
      s"dedup state must hold one row per distinct hash: $stateRows")

    // restart parity: re-running the whole chain with NO new input
    // replays nothing and changes no sink (checkpoint progress holds)
    val before = Seq(s"$tmp/final", s"$tmp/clean", s"$tmp/gopher_pass")
      .map(p => spark.read.parquet(p).count())
    runPipeline()
    val after = Seq(s"$tmp/final", s"$tmp/clean", s"$tmp/gopher_pass")
      .map(p => spark.read.parquet(p).count())
    assert(after == before, s"restart mutated sinks: $before -> $after")

    // batch parity: the streamed composition equals the batch kernels
    // composed directly (same verdicts, same survivors)
    val all = toDocs(arrival1 ++ arrival2)
    val gopherPass = TextAnalysis.gopherVerdicts(all)
      .filter(col("passes")).select("doc_id")
    val cleanBatch = CorpusOps.repetitionScored(
        all.join(gopherPass, Seq("doc_id")))
      .filter(!col("flagged"))
    val batchSurvivorHashes = cleanBatch
      .select(md5(col("text"))).distinct().collect().map(_.getString(0)).toSet
    val streamedHashes = spark.read.parquet(s"$tmp/final")
      .select(md5(col("text"))).collect().map(_.getString(0)).toSet
    assert(streamedHashes == batchSurvivorHashes,
      "streamed pipeline diverged from the composed batch kernels")
  }
}
