package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q134 (Hamilton apportionment) quota laws + q135 (contamination
  * provenance) brute-force replay and q68 reconciliation.
  */
class ApportionProvenanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q134: quotas are integers summing exactly to the budget, within 1 of exact") {
    val rows = graft.CacheScope.run {
      CorpusOps.q134EpochApportion(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    }
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == CorpusOps.EPOCH_BUDGET,
      "quotas must sum exactly to the budget")
    val total = rows.map(_._2).sum
    rows.foreach { case (s, tok, q) =>
      val fl = CorpusOps.EPOCH_BUDGET * tok / total
      assert(q == fl || q == fl + 1,
        s"source $s quota $q outside [floor, floor+1] of its share $fl")
    }
    // largest-remainder law: every topped-up source has remainder >= every
    // non-topped-up source's (ties broken by source asc)
    val withRem = rows.map { case (s, tok, q) =>
      (s, (CorpusOps.EPOCH_BUDGET * tok) % total,
        q == CorpusOps.EPOCH_BUDGET * tok / total + 1)
    }
    val worstTopped = withRem.filter(_._3).map(r => (-r._2, r._1)).max
    withRem.filterNot(_._3).foreach { case (s, rem, _) =>
      assert(implicitly[Ordering[(Long, String)]].lt(worstTopped, (-rem, s)),
        s"non-topped source $s (rem $rem) outranks a topped one")
    }
  }

  test("q134: hand fixture with a remainder tie resolves by source order") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("apportion").toString
    // 3 sources with token counts 5/3/2 over budget 1000: exact shares
    // 500/300/200 — all integral, no top-ups; then a 3/3/4 fixture would
    // tie. Use 1/1/1: shares 333.33.. each, deficit 1, tie on remainder
    // -> the lexicographically FIRST source gets the seat.
    Seq((1L, "a", "en", "s0", 0L), (2L, "b", "en", "s1", 0L),
      (3L, "c", "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val q = graft.CacheScope.run {
      CorpusOps.q134EpochApportion(spark, tmp)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    }
    assert(q == Map("s0" -> 334L, "s1" -> 333L, "s2" -> 333L), s"got $q")
  }

  test("q135: brute-force replay and q68 reconciliation") {
    val rows = graft.CacheScope.run {
      CorpusOps.q135ContaminationProvenance(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    }
    // brute force over the same 8-gram definition
    val d = graft.Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String): Set[String] = {
      val toks = t.split(" ")
      if (toks.length < 8) Set.empty
      else toks.sliding(8).map(_.mkString(" ")).toSet
    }
    val ev = d.filter(_._2 == "src0").map(r => (r._1, grams(r._3)))
    val tr = d.filter(_._2 != "src0").map(r => (r._1, grams(r._3)))
    assert(rows.keySet == ev.map(_._1).toSet, "one row per eval doc")
    var anyOffender = false
    ev.foreach { case (eid, eg) =>
      val hits = tr.map { case (tid, tg) => (tid, (eg & tg).size) }
        .filter(_._2 > 0)
      val (n, top, shared) = rows(eid)
      assert(n == hits.length.toLong, s"eval $eid offender count")
      if (hits.nonEmpty) {
        anyOffender = true
        val best = hits.minBy { case (tid, s) => (-s, tid) }
        assert(top.contains(best._1) && shared.contains(best._2.toLong),
          s"eval $eid worst offender drifted")
      } else assert(top.isEmpty && shared.isEmpty)
    }
    assert(anyOffender, "fixture has contaminated eval docs")
    // reconciliation: an eval doc has offenders iff q68 flags some train
    // doc sharing its grams; the union of flagged train docs matches
    val q68 = graft.CacheScope.run {
      CorpusOps.q68Decontaminate(spark, dir)
        .filter(col("contaminated")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    }
    val offenders = ev.flatMap { case (_, eg) =>
      tr.filter(t => (eg & t._2).nonEmpty).map(_._1)
    }.toSet
    assert(offenders == q68, "provenance offender set drifted from q68")
  }
}
