package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q149 Good–Turing count-of-counts: plain-Scala replay, the mass
  * identity Σ r·N_r = total bigram tokens, and the undefined-tail
  * contract (r* is NULL exactly where N_{r+1} = 0).
  */
class GoodTuringSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val got: Seq[(Long, Long, Option[Double])] =
    CorpusOps.queries("q149_good_turing")(spark, dir).collect()
      .map(r => (r.getAs[Long]("r"), r.getAs[Long]("n_r"),
        Option(r.get(r.fieldIndex("r_star")))
          .map(_.asInstanceOf[Double]))).toSeq.sortBy(_._1)

  private lazy val replay: Seq[(Long, Long, Option[Double])] = {
    val counts = Tables.load(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
      .flatMap { t =>
        val toks = t.split(" ", -1)
        toks.iterator.zip(toks.iterator.drop(1)).map(p => (p._1, p._2)).toSeq
      }
      .groupBy(identity).map(_._2.length.toLong)
    val nr = counts.groupBy(identity).map { case (r, g) => r -> g.size.toLong }
    nr.toSeq.sortBy(_._1).map { case (r, n) =>
      (r, n, nr.get(r + 1).map(n1 =>
        math.floor((r + 1).toDouble * n1 / n * 1e6 + 0.5) / 1e6))
    }
  }

  test("q149 matches the plain-Scala count-of-counts replay") {
    assert(got == replay,
      s"diverged:\n got ${got.take(6)}\nwant ${replay.take(6)}")
    assert(got.nonEmpty && got.head._1 == 1L,
      "a natural corpus must have singleton bigrams (N_1 row)")
  }

  test("mass identity and the undefined tail") {
    // Σ r·N_r = total bigram tokens — the conservation law any
    // miscounted explode/aggregate breaks
    val totalBigrams = Tables.load(spark, dir, "documents")
      .select((size(split(col("text"), " ")) - 1).as("n"))
      .filter(col("n") > 0).agg(sum("n")).collect()(0).getLong(0)
    assert(got.map(t => t._1 * t._2).sum == totalBigrams)
    // r* defined exactly where the next count class is populated
    val rs = got.map(_._1).toSet
    got.foreach { case (r, _, star) =>
      assert(star.isDefined == rs.contains(r + 1),
        s"r=$r: r_star defined=${star.isDefined} but N_{r+1} present=${rs.contains(r + 1)}")
    }
    // discounting direction: for the smoothed classes, adjusted mass
    // r*·N_r never exceeds the raw mass of the class above (sanity of
    // (r+1)N_{r+1}/N_r — it is EXACTLY that mass, restated per type)
    got.foreach { case (r, n, star) =>
      star.foreach { s =>
        val above = got.find(_._1 == r + 1).get
        assert(math.abs(s * n - (r + 1).toDouble * above._2) <= 0.5 * n * 1e-6 + 1e-6)
      }
    }
  }
}
