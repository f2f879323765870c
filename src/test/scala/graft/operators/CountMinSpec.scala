package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q158 Count-Min over trigram keys: plain-Scala sketch replay, the
  * one-sided error guarantee (est ≥ exact, ALWAYS — for every key, not
  * just the audit set), the measured error budget, real collisions in
  * the emitted tail, and the + merge law that makes the sketch
  * distributable.
  */
class CountMinSpec extends SparkSpec {

  private val d = TextAnalysis.CM_D
  private val w = TextAnalysis.CM_W

  private def bucket(j: Int, tri: String): Long = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$tri".getBytes("UTF-8"))
    java.lang.Long.parseLong(
      dig.map(b => f"$b%02x").mkString.substring(0, 15), 16) % w
  }

  private def triCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap { t =>
      val toks = t.split(" ", -1)
      toks.sliding(3).withFilter(_.length == 3).map(_.mkString(" "))
    }.groupBy(identity).map { case (t, g) => t -> g.size.toLong }

  private def texts(dir: String): Seq[String] =
    Tables.load(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq

  private def sketch(counts: Map[String, Long]): Map[(Int, Long), Long] =
    counts.toSeq.flatMap { case (t, c) =>
      (0 until d).map(j => (j, bucket(j, t)) -> c)
    }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }

  private def estimate(cm: Map[(Int, Long), Long], t: String): Long =
    (0 until d).map(j => cm.getOrElse((j, bucket(j, t)), 0L)).min

  test("q158 matches the plain-Scala sketch replay (sf0.001)") {
    val counts = triCounts(texts("/root/testdata/sf0.001"))
    val cm = sketch(counts)
    val got = TextAnalysis.queries("q158_count_min")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("which"), r.getAs[String]("tri")) ->
        (r.getAs[Long]("c_exact"), r.getAs[Long]("c_est"))).toMap
    assert(got.size == 200, s"query set size ${got.size}")
    got.foreach { case ((which, t), (ex, est)) =>
      assert(ex == counts(t), s"$which/$t exact $ex vs ${counts(t)}")
      assert(est == estimate(cm, t), s"$which/$t est $est vs replay")
    }
    // the audit must show REAL collisions (the sketch earning its error
    // term) — a collision-free sketch certifies nothing
    assert(got.exists { case (_, (ex, est)) => est > ex },
      "no collision surfaced in the audit set")
  }

  test("one-sided guarantee and the measured error budget (sf0.01)") {
    val counts = triCounts(texts("/root/testdata/sf0.01"))
    val cm = sketch(counts)
    val n = counts.values.sum
    val overs = counts.map { case (t, c) =>
      val est = estimate(cm, t)
      assert(est >= c, s"$t: est $est < exact $c — CM can never undercount")
      est - c
    }
    // expected overestimate per row is N/w; the min over d rows sits
    // well under it — allow 5× for the fixture's collision luck
    assert(overs.max <= 5 * n / w,
      s"max overestimate ${overs.max} vs budget ${5 * n / w} (N=$n)")
  }

  test("+ merge law: partition sketches add to the full sketch") {
    val all = texts("/root/testdata/sf0.001")
    val parts = all.zipWithIndex.groupBy(_._2 % 5).values
      .map(g => sketch(triCounts(g.map(_._1))))
    val merged = parts.flatten.groupBy(_._1)
      .map { case (k, g) => k -> g.map(_._2).sum }
    val full = sketch(triCounts(all))
    assert(merged == full, "cell-wise + of partition sketches diverged")
  }
}
