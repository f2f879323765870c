package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus build as a runnable artifact producer — what a
  * user points at a raw document table to get a TRAINING SET out, not
  * just verdicts: q100's ingest pipeline (quality gate → bloom
  * decontamination → exact dedup) decides which documents survive,
  * q103's block scrub rewrites the survivors' text with cross-document
  * duplicate spans removed, q80's content-hash rule assigns
  * train/valid/test, q89's two-pass ordinal assigns balanced shards,
  * and the result lands as `corpus/` parquet partitioned by split with
  * a stage-by-stage `manifest.json`.
  *
  * Every stage is the SAME shared kernel its driver query gates
  * (q100/q103/q80/q89 — nothing here can drift from the hash-matched
  * definitions), and the WHOLE composition is itself a driver query:
  * [[q104CorpusBuild]] returns the curated frame (text as md5) and its
  * oracle states ingest → scrub → split → shard in one SQL, so the
  * builder's end-to-end output is hash-gated, not just its stages.
  * Every exchange keeps its audited shape: verdicts and scrub key by
  * id/hash, the split is a pure projection, the shard ordinal shuffles
  * once by bucket.
  *
  * Usage: `runMain graft.CorpusBuild <sfDir> <outDir>`.
  */
object CorpusBuild {

  private[graft] final case class BuildFrames(
      verdicts: DataFrame, scrubbed: DataFrame, curated: DataFrame)

  /** The shared frame chain. Each stage ends in an EAGER materialization
    * through [[GraftCheckpoint.stage]] (not a cache): the composed
    * analyzed tree had grown so large that driver-side planning —
    * canonicalization for cache lookup, AQE re-walks per query stage —
    * dominated q104's wall (measured at sf0.1: 12-18 s of "execute"
    * against ~3 s of actual job time). Truncating lineage between stages
    * makes every downstream plan a few nodes over LogicalRDD leaves, so
    * planning is milliseconds and each stage's wall is its OWN
    * execution — which is also what makes [[q104StageProbe]]'s
    * attribution exact by construction. Same lineage discipline as
    * q155's rank loop. The seam picks localCheckpoint locally and
    * reliable checkpoint on a cluster (`spark.graft.checkpoint.mode` —
    * localCheckpoint blocks die with their executor), and records
    * wall/run/cpu per barrier; the shape — materialize each stage once,
    * plan only one stage deep — is the 100 TB shape either way.
    *
    * Remaining caches register in the CALLER's scope (the q79
    * convention; `materialize` and the driver harness both wrap the
    * terminal action in `CacheScope.run`).
    */
  private[graft] def buildFrames(spark: SparkSession, sfDir: String,
                                 cacheCurated: Boolean = true): BuildFrames = {
    val verdicts = ingestStage(spark, sfDir)
    val survivors = survivorsStage(spark, sfDir, verdicts)
    val scrubbed = scrubStage(survivors)
    val nonEmpty = CacheScope.cache(scrubbed.filter(length(col("text")) > 0))
    val curated = curatedStage(survivors, nonEmpty, cacheCurated)
    BuildFrames(verdicts, scrubbed, curated)
  }

  // ---- the four build stages, factored so [[q104StageProbe]] times the
  // EXACT frames the builder runs (one definition, no probe drift) ----

  private[graft] def ingestStage(spark: SparkSession, sfDir: String): DataFrame =
    GraftCheckpoint.stage(
      operators.CorpusOps.q100IngestPipeline(spark, sfDir), "q104_ingest")

  /** Survivors of the ingest pipeline, with their metadata. */
  private[graft] def survivorsStage(spark: SparkSession, sfDir: String,
                             verdicts: DataFrame): DataFrame = {
    val corpus = Tables.load(spark, sfDir, "documents")
      .filter(col("source") =!= "src0")
    GraftCheckpoint.stage(
      corpus.select(col("doc_id"), col("text"), col("lang"), col("source"))
        .join(verdicts.filter(col("kept")).select(col("doc_id")), Seq("doc_id")),
      "q104_survivors")
  }

  /** q103's scrub, materializing the TEXT (same kernels: block explode,
    * shared first-occurrence keep rule, in-row reassembly).
    */
  private[graft] def scrubStage(survivors: DataFrame): DataFrame =
    GraftCheckpoint.stage(
      operators.CorpusOps.firstOccurrenceKeep(
        operators.CorpusOps.scrubBlocks(survivors))
        .groupBy(col("doc_id"))
        .agg(operators.CorpusOps.scrubAssembled.as("text"),
          count(lit(1)).as("n_blocks"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"))
        // r19: the scrubbed text's md5 is computed ONCE, here, ahead of
        // the checkpoint barrier — both downstream consumers (the q80
        // split bucket and q104's scrubbed_md5 output column) used to
        // recompute md5 over the full text (guide §2.3: decide on a
        // 32-char proxy, not the payload; at 100 TB that is two whole-
        // corpus md5 passes saved and the text column stays prunable
        // out of every downstream exchange)
        .withColumn("scrubbed_md5", md5(col("text"))),
      "q104_scrub")

  /** q80's content-hash split over the CURATED text + q89's shared
    * two-pass shard ordinal over the curated ids (fully-scrubbed docs are
    * already dropped from `nonEmpty`; counted in the manifest). Cached:
    * `materialize` consumes the curated frame twice (the parquet write
    * and the manifest count) — uncached, the assembly joins and the
    * ordinal windows would run a second full pass just for a count.
    */
  private[graft] def curatedStage(survivors: DataFrame, nonEmpty: DataFrame,
                                  cache: Boolean = true): DataFrame = {
    // the q80 bucket over the PRE-COMPUTED scrub md5 (same value as
    // md5(text) — computed once in scrubStage, ahead of the barrier)
    val bucket = pmod(conv(substring(col("scrubbed_md5"), 1, 15), 16, 10)
      .cast("long"), lit(100))
    val curated = nonEmpty
      .join(survivors.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .withColumn("split",
        when(bucket < 90, "train").when(bucket < 95, "valid").otherwise("test"))
      .join(operators.CorpusOps.shardOrdinals(nonEmpty.select(col("doc_id"))),
        Seq("doc_id"))
    // `materialize` consumes the curated frame twice (parquet write +
    // manifest count) — cached there; q104's query path consumes it ONCE,
    // where the cache only forced materializing every column (text, lang,
    // source) that the query's final projection would otherwise prune
    if (cache) CacheScope.cache(curated) else curated
  }

  /** Per-stage probe for q104 — the heaviest query in the artifact needs
    * its wall attributable to a stage (the q66/q45 probe contract):
    * stages run the EXACT builder frames, each materialized inside its
    * timer, and emit one Telemetry event each. `split_shard` covers the
    * pure-projection split plus the two-pass ordinal and assembly joins.
    * Attribution is exact because the stage functions each END in an
    * eager localCheckpoint: a stage's timer covers its own execution
    * only, never a re-walk of upstream lineage (the r13 probe read
    * `split_shard` at 3× the whole query's wall because every count
    * re-paid Catalyst planning over the full composed tree). The probe
    * runs the chain TWICE and records each stage's MIN — the
    * steal-resistant estimate on a co-tenant box (the bench queries get
    * the same treatment via their 3-sample medians; a single-sample
    * probe would re-open the gap the restructure closed).
    */
  def q104StageProbe(spark: SparkSession, dir: String): Unit = {
    val samples = (1 to 2).map { _ =>
      CacheScope.run {
        val out = Seq.newBuilder[(String, Double, Long)]
        def stage[A](name: String)(work: => (A, Long)): A = {
          val t0 = System.nanoTime()
          val (o, n) = work
          out += ((name, (System.nanoTime() - t0) / 1e9, n))
          o
        }
        val verdicts = stage("ingest") {
          val d = ingestStage(spark, dir); (d, d.count())
        }
        val survivors = stage("survivors") {
          val d = survivorsStage(spark, dir, verdicts); (d, d.count())
        }
        val nonEmpty = stage("scrub") {
          val d = CacheScope.cache(scrubStage(survivors).filter(length(col("text")) > 0))
          (d, d.count())
        }
        stage("split_shard") {
          // cache=false: the probe attributes the QUERY's wall (q104's
          // single-consumer path), not the builder's two-consumer cache
          val d = curatedStage(survivors, nonEmpty, cache = false); (d, d.count())
        }
        out.result()
      }
    }
    samples.head.indices.foreach { i =>
      val (name, _, rows) = samples.head(i)
      val secs = samples.map(_(i)._2).min
      Telemetry.record(f"q104probe stage=$name secs=$secs%.3f rows=$rows")
    }
  }

  /** The whole build as a driver-gated query: curated rows with the
    * scrubbed text as md5 (the hash compare certifies the text without
    * hauling it), plus split/shard/ordinal.
    */
  def q104CorpusBuild(spark: SparkSession, dir: String): DataFrame =
    buildFrames(spark, dir, cacheCurated = false).curated
      .select(col("doc_id"), col("n_blocks"), col("n_removed"),
        col("scrubbed_md5"),
        col("split"), col("shard"), col("ordinal"))

  def materialize(spark: SparkSession, sfDir: String,
                  outDir: String): Map[String, Long] = CacheScope.run {
    val f = buildFrames(spark, sfDir)
    f.curated
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_blocks"), col("n_removed"), col("split"), col("shard"),
        col("ordinal"))
      .write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")

    val v = f.verdicts.groupBy().agg(
      count(lit(1)).as("n_input"),
      sum(when(col("quality_flagged"), 1L).otherwise(0L)).as("flagged"),
      sum(when(col("contaminated"), 1L).otherwise(0L)).as("contaminated"),
      sum(when(col("is_dup"), 1L).otherwise(0L)).as("dups"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept")).head()
    val scrubAgg = f.scrubbed.agg(
      coalesce(sum(col("n_blocks")), lit(0L)),
      coalesce(sum(col("n_removed")), lit(0L))).head()
    val nCurated = f.curated.count()
    val manifest = Map(
      "n_input" -> v.getLong(0),
      "n_quality_flagged" -> v.getLong(1),
      "n_contaminated" -> v.getLong(2),
      "n_dups" -> v.getLong(3),
      "n_kept" -> v.getLong(4),
      "n_blocks_total" -> scrubAgg.getLong(0),
      "n_blocks_removed" -> scrubAgg.getLong(1),
      "n_fully_scrubbed_dropped" -> (v.getLong(4) - nCurated),
      "n_curated" -> nCurated)
    writeManifest(spark, s"$outDir/manifest.json", manifest)
    manifest
  }

  private def writeManifest(spark: SparkSession, path: String,
                            m: Map[String, Long]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (k, n) => s"""  "$k": $n""" }.mkString("{\n", ",\n", "\n}\n")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_corpus_build" -> q104CorpusBuild)

  /** The builder's whole composition in one SQL: the shared ingest CTEs
    * (verbatim the q100 oracle's), the q103 scrub CTEs restricted to the
    * survivors, the q80 split CASE over the reassembled text, and q89's
    * naive global-row_number shard spec — the hash match certifies the
    * two-pass Spark plan AND the staged composition at once.
    */
  val oracleSql: Map[String, String] = Map(
    "q104_corpus_build" ->
      s"""WITH ${operators.CorpusOps.ingestCtes},
        |surv AS (
        |  SELECT sk.doc_id, q.text FROM sk JOIN q ON q.doc_id = sk.doc_id
        |  WHERE sk.doc_id = sk.keeper),
        |sb0 AS (SELECT doc_id, string_split(text, ' ') AS tok FROM surv),
        |sb1 AS (
        |  SELECT doc_id, tok,
        |    unnest(generate_series(0,
        |      CAST(ceil(len(tok) / 64.0) AS BIGINT) - 1)) AS idx
        |  FROM sb0),
        |sb AS (
        |  SELECT doc_id, idx,
        |    array_to_string(tok[idx*64+1 : idx*64+64], ' ') AS btxt
        |  FROM sb1),
        |sr AS (
        |  SELECT doc_id, idx, btxt,
        |    row_number() OVER (PARTITION BY md5(btxt) ORDER BY doc_id, idx) AS rn
        |  FROM sb),
        |scr AS (
        |  SELECT doc_id, count(*) AS n_blocks,
        |    CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |    coalesce(string_agg(CASE WHEN rn = 1 THEN btxt END, ' ' ORDER BY idx), '')
        |      AS new_text
        |  FROM sr GROUP BY doc_id),
        |cur AS (
        |  SELECT doc_id, n_blocks, n_removed, new_text,
        |    ('0x' || substr(md5(new_text), 1, 15))::BIGINT % 100 AS bkt
        |  FROM scr WHERE length(new_text) > 0),
        |o AS (
        |  SELECT doc_id, n_blocks, n_removed, new_text, bkt,
        |    row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
        |      AS ordinal,
        |    count(*) OVER () AS n
        |  FROM cur)
        |SELECT doc_id, n_blocks, n_removed, md5(new_text) AS scrubbed_md5,
        |  CASE WHEN bkt < 90 THEN 'train'
        |       WHEN bkt < 95 THEN 'valid' ELSE 'test' END AS split,
        |  CAST(floor(ordinal * 16 / n) AS INTEGER) AS shard, ordinal
        |FROM o""".stripMargin)

  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("usage: graft.CorpusBuild <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .appName("graft-corpus-build")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try println(materialize(spark, sfDir, outDir))
    finally spark.stop()
  }
}
