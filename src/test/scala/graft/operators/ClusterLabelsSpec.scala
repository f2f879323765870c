package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q163 c-TF-IDF labels: full replay on top of q72's assignment surface
  * (one assignment definition — any drift between the two queries fails
  * here), plus the rarity law the score exists for.
  */
class ClusterLabelsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q163 matches the replay built on q72's assignment") {
    val assign = Similarity.queries("q72_kmeans_assign")(spark, dir)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tf = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        assign.get(r.getLong(0)).toSeq.flatMap(c =>
          r.getString(1).split(" ", -1).map(w => (c, w)))
      }
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val ft = tf.groupBy(_._1._2).map { case (w, g) => w -> g.values.sum }
    val t = tf.values.sum
    val k = Similarity.PRUNE_K
    def sm(cw: (Long, String)): Long =
      tf(cw) * math.floor(math.log((k * ft(cw._2) + t).toDouble /
        (k * ft(cw._2)).toDouble) * 1e6 + 0.5).toLong
    val want = tf.keys.toSeq.groupBy(_._1).flatMap { case (c, cws) =>
      cws.sortBy(cw => (-sm(cw), cw._2)).take(Similarity.CTFIDF_TOP)
        .zipWithIndex.map { case (cw, i) =>
          (c, cw._2) -> (tf(cw), ft(cw._2), sm(cw), i + 1)
        }
    }
    val got = Similarity.queries("q163_cluster_labels")(spark, dir)
      .collect().map(r => (r.getAs[Long]("cluster"), r.getAs[String]("token")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("f_t"),
          math.floor(r.getAs[Double]("score") * 1e6 + 0.5).toLong,
          r.getAs[Int]("rk"))).toMap
    assert(got == want,
      s"diverged: got ${got.size} rows, want ${want.size}")
    // rarity law inside the emitted rows: same cluster, same tf → the
    // corpus-rarer token never ranks below the commoner one
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      for {
        (_, (tfA, ftA, _, rkA)) <- rows
        (_, (tfB, ftB, _, rkB)) <- rows
        if tfA == tfB && ftA < ftB
      } assert(rkA < rkB, s"rarity law violated in $rows")
    }
  }
}
