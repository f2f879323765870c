package graft.operators

import graft.SparkSpec

/** q119 (epoch-wise deterministic reshuffle): the oracle pins the exact
  * permutations; this spec pins the permutation laws (gap-free per-epoch
  * ordinals, balanced contiguous shards), that epochs really differ, and
  * the two-pass plan shape (no per-epoch single-reducer ordinal).
  */
class EpochShuffleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("each epoch is a gap-free permutation; epochs differ; shards balanced") {
    val rows = CorpusOps.q119EpochShuffle(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byEpoch = rows.groupBy(_._2)
    assert(byEpoch.keySet == (0 until CorpusOps.SHUFFLE_EPOCHS).toSet)
    val n = byEpoch.head._2.length
    byEpoch.foreach { case (e, v) =>
      assert(v.map(_._3).sorted.toSeq == (0L until n).toSeq,
        s"epoch $e ordinals are not a gap-free permutation")
      // contiguous balanced shards: sizes differ by at most one
      val sizes = v.groupBy(_._4).map(_._2.length)
      assert(sizes.max - sizes.min <= 1, s"epoch $e shard sizes: $sizes")
    }
    // the whole point: epoch 0 and epoch 1 order the corpus DIFFERENTLY
    val ord0 = byEpoch(0).sortBy(_._3).map(_._1).toSeq
    val ord1 = byEpoch(1).sortBy(_._3).map(_._1).toSeq
    assert(ord0 != ord1, "epoch permutations are identical")
    assert(ord0.toSet == ord1.toSet, "epochs disagree on corpus membership")
  }

  test("plan: the ranking window is keyed by (epoch, bucket), never epoch alone") {
    val p = CorpusOps.q119EpochShuffle(spark, dir)
      .queryExecution.executedPlan.toString
    // a `row_number over (partition by epoch order by h)` would funnel
    // each epoch replica through one reducer; the two-pass keeps every
    // windowspec bucket-keyed
    val specs = "windowspecdefinition\\(epoch#\\d+[L]?, ([a-z_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, "no window found:\n" + p)
    assert(specs.forall(k => k == "bucket"),
      s"window keyed by epoch alone (partition keys after epoch: $specs):\n$p")
  }
}
