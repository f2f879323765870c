package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q155 integer PageRank: plain-Scala replay of the exact recurrence on
  * the real pair graph, and the centrality/symmetry signatures on a
  * constructed star+edge graph fed through the production kernel.
  */
class PairRankSpec extends SparkSpec {

  private def replay(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val bi = pairs.flatMap(p => Seq(p, p.swap))
    val adj = bi.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    val deg = adj.map { case (s, g) => s -> g.size.toLong }
    val n = deg.size.toLong
    val teleport = 150000000L / n
    var r: Map[Long, Long] = deg.map { case (id, _) => id -> 1000000000L / n }
    for (_ <- 1 to CorpusOps.PR_ITERS) {
      val shares = r.map { case (id, rv) => id -> rv / deg(id) }
      r = adj.map { case (dst, _) =>
        dst -> (teleport +
          85L * bi.collect { case (s, d) if d == dst => shares(s) }.sum / 100L)
      }
    }
    r.map { case (id, rv) => id -> (deg(id), rv) }
  }

  test("q155 matches the plain-Scala integer recurrence (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val pairs = Dedup.minhashNearDupPairs(
      Tables.load(spark, dir, "documents"))
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.nonEmpty, "fixture must have near-dup pairs")
    val want = replay(pairs)
    val got = CorpusOps.queries("q155_pair_rank")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("pr_nano"))).toMap
    assert(got == want,
      s"diverged: ${got.toSeq.sortBy(_._1).take(3)} vs ${want.toSeq.sortBy(_._1).take(3)}")
  }

  test("centrality and symmetry on a constructed star + detached edge") {
    import spark.implicits._
    // hub 1 connects to 2/3/4 (a dup-template hub); 10–11 is a detached
    // symmetric pair
    val pairFrame = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
      .toDF("a_id", "b_id")
    val out = graft.CacheScope.run {
      CorpusOps.pageRankOnPairs(pairFrame)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("deg"), r.getAs[Long]("pr_nano"))).toMap
    }
    // the hub out-ranks every leaf (centrality signature)
    assert(Seq(2L, 3L, 4L).forall(l => out(1L)._2 > out(l)._2),
      s"hub must dominate leaves: $out")
    // structurally equivalent nodes get the identical integer rank
    assert(out(2L)._2 == out(3L)._2 && out(3L)._2 == out(4L)._2)
    assert(out(10L)._2 == out(11L)._2)
    // every rank carries at least the teleport floor and total mass
    // never exceeds the initial 1e9 budget (floor division only leaks)
    val teleport = 150000000L / 6L
    assert(out.values.forall(_._2 >= teleport))
    assert(out.values.map(_._2).sum <= 1000000000L)
    // and the loop agrees with the plain recurrence on this graph too
    val want = replay(Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L)))
    assert(out == want, s"got $out want $want")
  }

  test("barrier cadence: <= 4 materializations for 8 rounds") {
    import spark.implicits._
    // the replay tests above prove cadence-INDEPENDENCE of the values
    // (the plain-Scala recurrence has no checkpoints at all); this pins
    // the cadence itself — the r13 shape was 8 eager barriers, pure
    // scheduling floor on a tiny subgraph
    val pairFrame = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    graft.CacheScope.run {
      CorpusOps.pageRankOnPairs(pairFrame).collect()
    }
    val barriers = CorpusOps.prBarriersLastRun.get
    val expected = (1 to CorpusOps.PR_ITERS)
      .count(i => i % CorpusOps.PR_CHECKPOINT_EVERY == 0 || i == CorpusOps.PR_ITERS)
    assert(barriers == expected, s"loop took $barriers barriers, cadence says $expected")
    assert(barriers <= 4, s"8 rounds must materialize at most 4 times, took $barriers")
  }
}
