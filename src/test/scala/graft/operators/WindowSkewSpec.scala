package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew fixture for the first-occurrence keep rule: one block content at
  * 50% frequency (the license-boilerplate shape this operator exists to
  * scrub). The aggregate form must (a) keep the window form's exact
  * semantics and (b) actually combine map-side — the hot hash crosses the
  * winners shuffle as at most one row PER MAP PARTITION, where the old
  * `row_number` window shipped every occurrence to a single reducer and
  * sorted them there.
  */
class WindowSkewSpec extends SparkSpec {
  import spark.implicits._

  test("firstOccurrenceKeep: window-equal semantics; hot block combines map-side") {
    // 500 occurrences of ONE block + 100 distinct cold blocks, 8 partitions
    val rows = (1 to 500).map(i => (i.toLong, i % 3, "the hot boilerplate block")) ++
      (1 to 100).map(i => (1000L + i, 0, s"cold block $i"))
    val blocks = rows.toDF("doc_id", "idx", "btxt").repartition(8)

    // reference: the single-reducer window shape this replaced
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("idx"))
    val ref = blocks.withColumn("h", md5(col("btxt")))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("idx"), col("keep"))

    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val marked = CorpusOps.firstOccurrenceKeep(blocks)
      val got = marked.select(col("doc_id"), col("idx"), col("keep"))
      assert(got.except(ref).isEmpty && ref.except(got).isEmpty,
        "aggregate keep rule diverged from the window semantics")
      assert(marked.filter(col("keep")).count() == 101L,
        "exactly one hot occurrence + all cold blocks survive")

      // structural straggler proof, SkewSpec-style but for the aggregate:
      // run the plan and read the partial phase's OUTPUT metric. 600 input
      // rows shrink to <= (#partitions for the hot hash) + 100 cold rows
      // before the shuffle — the hot block's 500 occurrences never travel.
      val qe = CorpusOps.firstOccurrenceKeep(blocks).queryExecution
      qe.toRdd.count()
      // struct-typed min compiles to SortAggregate (no mutable hash buffer
      // for structs) — still a genuine map-side partial phase
      val partialOut = qe.executedPlan.collect {
        case a: BaseAggregateExec if a.aggregateExpressions.exists(
          _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial) =>
          a.metrics("numOutputRows").value
      }
      assert(partialOut.nonEmpty, "winners aggregate lost its partial phase:\n" +
        qe.executedPlan.toString)
      val shuffled = partialOut.sum
      assert(shuffled <= 8 + 100,
        s"partial phase must collapse the hot block map-side; $shuffled rows crossed " +
          "the winners shuffle (window shape would ship all 500 hot occurrences)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("firstOccurrenceKeep: alsoKeep verdict ANDs with global-first, winner unchanged") {
    // ledger-seen rows (alsoKeep=false) must not shift the winner: rank
    // first over ALL occurrences, then AND — the streaming-scrub contract
    val blocks = Seq(
      (1L, 0, "dup"), (2L, 0, "dup"), (3L, 0, "dup"), (4L, 0, "solo"))
      .toDF("doc_id", "idx", "btxt")
      .withColumn("seen", col("doc_id") === 1L)
    val marked = CorpusOps.firstOccurrenceKeep(blocks, !col("seen"))
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // doc 1 is the global first occurrence but seen -> dropped; doc 2 must
    // NOT be promoted (the window semantics: rank over all, then AND)
    assert(marked == Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }
}
