package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the dedup graph layer: the distributed min-label
  * connected-components loop must agree with a driver-side union-find on
  * arbitrary random graphs (chains, cliques, isolated nodes, forests).
  */
class DedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n.toLong.toInt)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the component minimum
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("distributed CC matches union-find on random graphs") {
    val rng = new scala.util.Random(101)
    for (trial <- 1 to 4) {
      val n = 60 + trial * 20
      val m = rng.nextInt(n * 2)
      val edges = (0 until m).map { _ =>
        val a = rng.nextInt(n).toLong
        val b = rng.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val expected = unionFind(n, edges)

      // drive the PRODUCTION loop q58/q66 share
      val edgesDf = edges.toDF("a_id", "b_id")
      val nodesDf = (0 until n).map(_.toLong).toDF("id")
      val got = Dedup.connectedComponents(edgesDf, nodesDf)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial: CC labels diverge from union-find")
    }
  }
}
