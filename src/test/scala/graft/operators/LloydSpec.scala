package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q156 multi-round Lloyd: the descent law on the real fixture, blob
  * recovery + tie determinism + the empty-cluster carry-over on
  * constructed geometry — the branch the fixture corpora never take.
  */
class LloydSpec extends SparkSpec {

  private def dist2(v: Seq[Float], c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) { val df = v(i).toDouble - c(i); d += df * df; i += 1 }
    math.signum(d) * math.floor(math.abs(d) * 1e6 + 0.5) / 1e6
  }

  private def inertia(vecs: Seq[Seq[Float]],
                      cents: Array[(Long, Array[Double])]): Double =
    vecs.map(v => cents.map(c => dist2(v, c._2)).min).sum

  test("descent law: each Lloyd round does not increase inertia (sf0.001)") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val vecs = e.select(col("embedding")).collect()
      .map(_.getSeq[Float](0)).toSeq
    val traj = (0 to Similarity.LLOYD_ROUNDS).map(r =>
      inertia(vecs, Similarity.lloydCentroids(e, Similarity.LLOYD_K, r)))
    traj.sliding(2).foreach { case Seq(a, b) =>
      // micro-unit rounding can nudge a step by ≤ 1e-6 per point
      assert(b <= a + 1e-6 * vecs.size,
        s"inertia rose across a round: $traj")
    }
    // and the rounds genuinely move: the final inertia beats the seeds'
    assert(traj.last < traj.head, s"no descent at all: $traj")
  }

  test("blob recovery, tie determinism, empty-cluster carry-over") {
    import spark.implicits._
    // ids 0 and 1 seed k=2. Seed vectors are IDENTICAL → every point
    // ties between the two clusters at round 1 and the lower id wins:
    // cluster 1 is empty from the first assignment and must keep its
    // seed centroid through all rounds.
    val blobA = Seq(0L -> Array(0f, 0f), 1L -> Array(0f, 0f),
      2L -> Array(0.2f, 0f), 3L -> Array(-0.2f, 0f))
    val blobB = Seq(10L -> Array(10f, 10f), 11L -> Array(10.2f, 10f),
      12L -> Array(9.8f, 10f))
    val e = (blobA ++ blobB).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    // ROUND 1: every tie goes to cluster 0, so cluster 0's centroid is
    // the global micro-mean and empty cluster 1 carries its seed over
    val c1r = Similarity.lloydCentroids(e, 2, 1).toMap
    val all = blobA ++ blobB
    val want0 = Array(0, 1).map { i =>
      val mean = all.map(p =>
        math.floor(p._2(i).toDouble * 1e6 + 0.5)).sum / all.size / 1e6
      math.signum(mean) * math.floor(math.abs(mean) * 1e6 + 0.5) / 1e6
    }
    assert(c1r(0L).zip(want0).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      s"cluster 0 centroid ${c1r(0L).toSeq} want ${want0.toSeq}")
    assert(c1r(1L).toSeq == Seq(0.0, 0.0),
      s"empty cluster moved: ${c1r(1L).toSeq}")
    // FULL RUN: the carried-over stale centroid recaptures blob A in
    // round 2 — the degenerate seeding self-repairs and the two blobs
    // separate exactly (blob A's micro-mean is exactly the seed point)
    val cents = Similarity.lloydCentroids(e, 2, 3).toMap
    assert(cents(1L).toSeq == Seq(0.0, 0.0), s"blob A: ${cents(1L).toSeq}")
    assert(cents(0L).toSeq == Seq(10.0, 10.0), s"blob B: ${cents(0L).toSeq}")
    // blob recovery: BOTH seeds (the two lowest ids, 0 and 2) start
    // inside blob A; the rounds must still pull one centroid across to
    // blob B and land both on the exact micro-unit blob means
    val e2 = (Seq(0L -> Array(0f, 0f)) ++ blobA.drop(2) ++ blobB)
      .map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val cents2 = Similarity.lloydCentroids(e2, 2, 3).toMap
    assert(math.abs(cents2(0L)(0)) < 1e-9 && math.abs(cents2(0L)(1)) < 1e-9,
      s"blob A centroid: ${cents2(0L).toSeq}") // mean(0, .2, -.2) = 0
    assert(math.abs(cents2(2L)(0) - 10.0) < 1e-6 &&
      math.abs(cents2(2L)(1) - 10.0) < 1e-9,
      s"blob B centroid: ${cents2(2L).toSeq}")
    // and the final assignment splits exactly along the blobs
    val assigned = e2.collect().map { r =>
      val v = r.getSeq[Float](1)
      r.getLong(0) -> cents2.toSeq.map(c => (dist2(v, c._2), c._1))
        .minBy(identity)._2
    }.toMap
    assert(Seq(0L, 2L, 3L).forall(assigned(_) == 0L), s"$assigned")
    assert(Seq(10L, 11L, 12L).forall(assigned(_) == 2L), s"$assigned")
  }
}
