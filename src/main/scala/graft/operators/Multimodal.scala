package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed by a partition-wise batch decoder — the Spark-side shape a
  * real image/audio pipeline needs (schema, partitioning, batch signature),
  * with the codec STUBBED deterministically (no image/audio libs in this
  * container).
  *
  * Payloads are derived from `documents.text` bytes so every scale factor
  * has a corpus; a production deployment swaps [[StubCodec.decode]] for a
  * real decoder (e.g. JNI image lib) without touching the plumbing.
  *
  * Scale: decode runs via `mapPartitions` — one codec instance per task,
  * batch-amortized, no shuffle; the feature aggregation afterwards is the
  * only exchange.
  */
object Multimodal {

  /** Decoded features of one payload. */
  final case class MediaFeatures(
      doc_id: Long, byte_len: Int, first_byte: Int, checksum: Long,
      width: Int, height: Int)

  /** STUB codec — deterministic fake decode. A real implementation would
    * decode image bytes here; the (width, height) are synthesized from the
    * payload so downstream schema/tests are real.
    */
  object StubCodec {
    def decode(docId: Long, bytes: Array[Byte]): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      MediaFeatures(docId, bytes.length, if (bytes.nonEmpty) bytes(0) & 0xff else -1,
        sum, width = 64 + (sum % 64).toInt, height = 64 + (bytes.length % 64))
    }
  }

  /** One sampled frame of a payload (video-style frame extraction shape). */
  final case class FrameSlice(
      doc_id: Long, frame_idx: Int, frame_off: Int, frame_len: Int,
      frame_checksum: Long)

  /** STUB resize: a real implementation rescales pixel buffers; the
    * deterministic output dims keep the plumbing and tests honest.
    */
  object StubResize {
    def resize(f: MediaFeatures, targetW: Int, targetH: Int): MediaFeatures =
      f.copy(width = targetW, height = targetH)
  }

  /** documents → (doc_id, payload binary, meta map): the multimodal table. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        map(lit("mime"), lit("application/octet-stream"),
          lit("source"), col("source")).as("meta"))

  /** Partition-wise decode: the `mapInPandas`-equivalent batch path. */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => StubCodec.decode(id, bytes) } }
  }

  /** Oracle-checkable slice of the decode: byte length, first byte and
    * checksum are real payload math both engines can compute.
    */
  def q54MultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(spark, dir).toDF()
      .select(col("doc_id"), col("byte_len"), col("first_byte"), col("checksum"))
  }

  /** Aggregate decoded features per source — decode feeding a relational
    * pipeline. The stub dims are pure byte math (width = 64 + checksum % 64,
    * height = 64 + byte_len % 64), so the oracle replays them from
    * hex(encode(text)) and the query is a hard hash-match.
    */
  def q55MultimodalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // decode ONCE with the grouping key carried through the batch decoder —
    // no second documents scan, no join back (the decoded side and the
    // metadata side used to be two reads of the same table)
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"), element_at(col("meta"), "source").as("source"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, src) => (StubCodec.decode(id, bytes), src) })
      .toDF("f", "source")
      .select(col("source"), col("f.*"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_w"),
        round(avg(col("height")), 4).as("avg_h"))
  }

  /** Frame sampling — the video-decode batch shape: each payload yields 4
    * deterministic byte-range "frames" (a real codec would seek keyframes;
    * the offsets/lengths/checksums are honest byte math either way), one
    * codec instance per partition, frames emitted with positional metadata.
    * Output scales linearly (4 rows per doc), no shuffle until a consumer
    * aggregates.
    */
  def frameSample(spark: SparkSession, dir: String): Dataset[FrameSlice] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val len = bytes.length
        if (len < 4) Iterator.empty
        else {
          val fl = len / 4
          (0 until 4).iterator.map { k =>
            val off = k * fl
            val flen = if (k < 3) fl else len - 3 * fl
            var sum = 0L
            var i = off
            while (i < off + flen) { sum += bytes(i) & 0xff; i += 1 }
            FrameSlice(id, k, off, flen, sum)
          }
        }
      })
  }

  def q59MultimodalFrames(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir).toDF()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_multimodal_meta" -> q54MultimodalMeta,
    "q55_multimodal_agg" -> q55MultimodalAgg,
    "q59_multimodal_frames" -> q59MultimodalFrames)

  // Oracle side works on hex(encode(text)) so offsets, lengths and
  // checksums are BYTE math exactly like the Spark side's payload bytes —
  // a character-based substr/ascii formulation would diverge on any
  // non-ASCII document (multi-byte code points).
  val oracleSql: Map[String, String] = Map(
    "q54_multimodal_meta" ->
      """WITH h AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS INT) AS len
        |  FROM documents)
        |SELECT doc_id, len AS byte_len,
        |  CAST(CASE WHEN len = 0 THEN -1
        |    ELSE ('0x' || substr(hx, 1, 2))::INT END AS INT) AS first_byte,
        |  CAST(CASE WHEN len = 0 THEN 0
        |    ELSE list_aggregate(list_transform(generate_series(1, len),
        |      i -> ('0x' || substr(hx, 2 * i - 1, 2))::BIGINT), 'sum')
        |    END AS BIGINT) AS checksum
        |FROM h""".stripMargin,
    "q55_multimodal_agg" ->
      """WITH h AS (
        |  SELECT doc_id, source, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS INT) AS len
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, source, len AS byte_len,
        |    CAST(CASE WHEN len = 0 THEN 0
        |      ELSE list_aggregate(list_transform(generate_series(1, len),
        |        i -> ('0x' || substr(hx, 2 * i - 1, 2))::BIGINT), 'sum')
        |      END AS BIGINT) AS checksum
        |  FROM h)
        |SELECT source, count(*) AS n,
        |  CAST(sum(byte_len) AS BIGINT) AS total_bytes,
        |  round(avg(64 + (checksum % 64)), 4) AS avg_w,
        |  round(avg(64 + (byte_len % 64)), 4) AS avg_h
        |FROM f GROUP BY source""".stripMargin,
    "q59_multimodal_frames" ->
      """WITH d AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    CAST(octet_length(encode(text)) AS INT) AS len
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, hx, len, len // 4 AS fl,
        |    unnest([0, 1, 2, 3]) AS frame_idx
        |  FROM d WHERE len >= 4)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(frame_idx * fl AS INT) AS frame_off,
        |  CAST(CASE WHEN frame_idx < 3 THEN fl ELSE len - 3 * fl END AS INT) AS frame_len,
        |  CAST(list_aggregate(list_transform(
        |    generate_series(frame_idx * fl + 1,
        |      frame_idx * fl + CASE WHEN frame_idx < 3 THEN fl ELSE len - 3 * fl END),
        |    i -> ('0x' || substr(hx, 2 * i - 1, 2))::BIGINT), 'sum') AS BIGINT) AS frame_checksum
        |FROM f""".stripMargin)
}
