package graft

import org.apache.spark.sql.functions._

/** The stage-boundary seam: mode flip is result-invariant (the 100 TB
  * durability story is a config flag, not a code change), telemetry
  * carries the wall/run/cpu stall attribution, and a bad mode fails
  * loudly.
  */
class GraftCheckpointSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(GraftCheckpoint.ModeKey, mode)
    try body finally spark.conf.unset(GraftCheckpoint.ModeKey)
  }

  test("q104 and q155 are bit-identical under local and reliable modes") {
    val local104 = CacheScope.run {
      canon(CorpusBuild.queries("q104_corpus_build")(spark, dir))
    }
    val local155 = CacheScope.run {
      canon(operators.CorpusOps.queries("q155_pair_rank")(spark, dir))
    }
    assert(local104.nonEmpty && local155.nonEmpty)
    withMode("reliable") {
      val rel104 = CacheScope.run {
        canon(CorpusBuild.queries("q104_corpus_build")(spark, dir))
      }
      assert(rel104 == local104, "q104 moved under reliable checkpointing")
      val rel155 = CacheScope.run {
        canon(operators.CorpusOps.queries("q155_pair_rank")(spark, dir))
      }
      assert(rel155 == local155, "q155 moved under reliable checkpointing")
    }
  }

  test("every barrier records wall/run/cpu attribution telemetry") {
    Telemetry.drain()
    CacheScope.run {
      CorpusBuild.queries("q104_corpus_build")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    val evs = Telemetry.drain().filter(_.startsWith("ckpt "))
    val tags = evs.flatMap(_.split(" ").find(_.startsWith("tag="))).toSet
    Seq("tag=q104_ingest", "tag=q104_survivors", "tag=q104_scrub").foreach { t =>
      assert(tags.contains(t), s"missing barrier event $t in $tags")
    }
    evs.foreach { e =>
      assert(e.contains(" mode=") && e.contains(" wall=") &&
        e.contains(" run=") && e.contains(" cpu="), s"malformed event: $e")
      // attribution is parsable and sane: wall strictly positive, the
      // executor sums non-negative (a stalled barrier shows wall >> run)
      val kv = e.split(" ").flatMap(_.split("=") match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }).toMap
      assert(kv("wall").toDouble > 0.0)
      assert(kv("run").toDouble >= 0.0 && kv("cpu").toDouble >= 0.0)
    }
  }

  test("an unknown mode fails loudly, not silently-local") {
    import spark.implicits._
    withMode("ephemeral") {
      val e = intercept[IllegalArgumentException] {
        GraftCheckpoint.stage(Seq(1, 2).toDF("x"), "bad")
      }
      assert(e.getMessage.contains(GraftCheckpoint.ModeKey))
    }
  }
}
