package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q87 (SemDeDup-style semantic dedup) against a driver-side brute-force
  * replay of its own contract at sf0.001: cluster-partitioned near-dup
  * removal with the earliest-neighbor keep rule.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q87 keep rule matches a brute-force within-cluster replay") {
    val out = Similarity.queries("q87_semantic_dedup")(spark, dir)
      .select("vec_id", "cluster", "dup_of", "keep")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getBoolean(3))))
      .toMap

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(out.size == vecs.length, "one output row per vector")

    // replay: same seeds (8 lowest ids), same rounded-L2 assignment,
    // same rounded cosine threshold, same earliest-dup rule
    def round6(x: Double): Double = math.signum(x) * math.floor(math.abs(x) * 1e6 + 0.5) / 1e6
    val seeds = vecs.take(8).map { case (id, v) => (id, v.map(_.toDouble)) }
    def assign(v: Array[Float]): Long = seeds.map { case (sid, s) =>
      (round6(v.indices.map(i => (v(i) - s(i)) * (v(i) - s(i))).sum), sid)
    }.min._2
    val clusters = vecs.map { case (id, v) => id -> assign(v) }.toMap
    val norms = vecs.map { case (id, v) => id -> v.map(x => x.toDouble * x).sum }.toMap
    var drops = 0
    for ((id, v) <- vecs) {
      val dupOf = vecs.iterator.takeWhile(_._1 < id)
        .filter { case (a, _) => clusters(a) == clusters(id) }
        .find { case (a, av) =>
          val dot = v.indices.map(i => av(i).toDouble * v(i)).sum
          round6(dot / (math.sqrt(norms(a)) * math.sqrt(norms(id)))) >= 0.35
        }.map(_._1)
      val (cl, dup, keep) = out(id)
      assert(cl == clusters(id), s"cluster mismatch for $id")
      assert(dup == dupOf.getOrElse(-1L), s"dup_of mismatch for $id: got $dup want $dupOf")
      assert(keep == dupOf.isEmpty, s"keep mismatch for $id")
      if (!keep) drops += 1
    }
    assert(drops > 0, "fixture contains within-cluster semantic dups")
    // every recorded duplicate points at an EARLIER vector in the SAME cluster
    out.foreach { case (id, (cl, dup, keep)) =>
      if (!keep) { assert(dup < id); assert(clusters(dup) == cl) }
    }
  }
}
