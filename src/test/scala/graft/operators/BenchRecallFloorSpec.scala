package graft.operators

import graft.SparkSpec

/** The floors AT THE BENCH SCALE FACTOR. AnnRecallSpec pins recall on the
  * sf0.001 fixture; the number each round PUBLISHES is measured at sf0.1
  * — and r9 showed the gap matters (q92's sf0.1 recall sat below its
  * fixture floor while nothing failed). This spec recomputes recall@3
  * exactly the way Bench does, at the sf Bench publishes, against the
  * same shared per-sf table (Similarity.RecallFloors) — a codebook or
  * quantizer regression that only shows at bench scale now fails the
  * suite, not just lowers a number in the artifact.
  */
class BenchRecallFloorSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.1"

  private def top3(q: String): Map[Long, Set[Long]] = graft.CacheScope.run {
    val m = Similarity.queries(q)(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rn") <= 3)
      .select("p_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    spark.catalog.clearCache()
    m
  }

  test("published recall clears its per-sf floor for every approximate path") {
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val exact = top3("q48_cosine_knn")
    assert(exact.nonEmpty, "no exact probes at bench sf")
    val failures = Similarity.RecallFloors.keys.toSeq.sorted.flatMap { q =>
      val approx = top3(q)
      val recall = exact.keySet.toSeq.map { p =>
        (exact(p) & approx.getOrElse(p, Set.empty)).size.toDouble / exact(p).size
      }.sum / exact.size
      val floor = Similarity.recallFloor(q, dir)
      info(f"$q recall@3 = $recall%.3f (floor $floor%.2f)")
      if (recall < floor) Some(f"$q: $recall%.3f < $floor%.2f") else None
    }
    assert(failures.isEmpty,
      s"published recall below floor at bench sf: ${failures.mkString("; ")}")
  }
}
