package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-gate contract (q96/q97): the sketch has NO false negatives (the
  * gate's survivors are a superset of the true hits, so the verified
  * result equals the plain exact join bit for bit), the gate actually
  * prunes (a sketch that passes everything is a no-op tax), and the
  * materialized index serves the same answer at the stored dials while
  * refusing meta-less directories.
  */
class BloomGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docsDf = graft.Tables.load(spark, dir, "documents")

  /** The plain exact join q96 must reproduce through the sketch path. */
  private def exactHits(): Map[Long, Long] = {
    val evalG = CorpusOps.tokenGrams(
      docsDf.filter(col("source") === "src0"), BloomGate.GRAM_N)
      .select(col("gram")).distinct()
    CorpusOps.tokenGrams(docsDf.filter(col("source") =!= "src0"), BloomGate.GRAM_N)
      .join(evalG, Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("q96 equals the plain exact join (no false negatives survive the verify)") {
    val got = graft.CacheScope.run {
      BloomGate.q96BloomDecontaminate(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    }
    val want = exactHits()
    val corpusN = docsDf.filter(col("source") =!= "src0").count()
    assert(got.length == corpusN, "one output row per corpus doc")
    got.foreach { case (id, n, flag) =>
      assert(n == want.getOrElse(id, 0L), s"doc $id: n_hits $n != exact ${want.get(id)}")
      assert(flag == (n > 0))
    }
    assert(got.count(_._3) > 0, "fixture should contain at least one contaminated doc")
  }

  test("the gate passes every true member and prunes most non-members") {
    val evalG = CorpusOps.tokenGrams(
      docsDf.filter(col("source") === "src0"), BloomGate.GRAM_N)
      .select(col("gram")).distinct().cache()
    try {
      val bloom = BloomGate.buildBloom(evalG)
      // no false negatives: every gram that went INTO the sketch passes
      val nEval = evalG.count()
      assert(BloomGate.bloomGate(evalG, bloom).count() == nEval,
        "a member gram failed might_contain — bloom contract broken")
      // pruning: corpus grams are mostly non-members at these dials
      // (~1% fp ceiling), so survivors must be well under the corpus
      // gram count — the map-side collapse the sketch exists for
      val corpusG = CorpusOps.tokenGrams(
        docsDf.filter(col("source") =!= "src0"), BloomGate.GRAM_N).cache()
      try {
        val total = corpusG.count()
        val survived = BloomGate.bloomGate(corpusG, bloom).count()
        assert(survived < total / 2,
          s"gate passed $survived of $total corpus grams — not pruning")
      } finally corpusG.unpersist()
    } finally evalG.unpersist()
  }

  test("index round-trip: q97 serves the q96 answer from the store; meta-less dirs refused") {
    val tmp = java.nio.file.Files.createTempDirectory("bloomgate").toFile.getPath
    BloomGate.writeBloomIndex(docsDf.filter(col("source") === "src0"), s"$tmp/idx")
    val served = graft.CacheScope.run {
      BloomGate.decontaminateAgainstIndex(
        docsDf.filter(col("source") =!= "src0"), s"$tmp/idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    val want = exactHits()
    val corpusIds = docsDf.filter(col("source") =!= "src0")
      .select("doc_id").collect().map(_.getLong(0))
    corpusIds.foreach { id =>
      assert(served(id) == want.getOrElse(id, 0L), s"served n_hits drifted for doc $id")
    }
    // the stored dials drive the serving width
    val idx = BloomGate.loadBloomIndex(spark, s"$tmp/idx")
    assert(idx.gramN == BloomGate.GRAM_N)
    assert(idx.bloomBytes.length >= BloomGate.NUM_BITS.toInt / 8,
      "sketch bytes should carry the full bit array")
    // refusal contract: no meta — no serving
    intercept[IllegalStateException] {
      BloomGate.loadBloomIndex(spark, s"$tmp/nothere")
    }
  }

  test("withBloomLimits never lowers a user-raised session limit") {
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (prevItems, prevBits) =
      (spark.conf.getOption(itemsKey), spark.conf.getOption(bitsKey))
    try {
      // a user raised the session limits ABOVE the guard's request: the
      // scoped raise must be max(current, requested, default), not a
      // temporary clamp back down to the request
      spark.conf.set(itemsKey, 50000000L)
      spark.conf.set(bitsKey, 1L << 30)
      BloomGate.withBloomLimits(spark, estItems = 4000000L, numBits = 1L << 26) {
        assert(spark.conf.get(itemsKey).toLong >= 50000000L,
          "guard LOWERED a user-raised maxNumItems mid-build")
        assert(spark.conf.get(bitsKey).toLong >= (1L << 30),
          "guard LOWERED a user-raised maxNumBits mid-build")
      }
      // and the user values are restored untouched
      assert(spark.conf.get(itemsKey).toLong == 50000000L)
      assert(spark.conf.get(bitsKey).toLong == (1L << 30))
    } finally {
      def restore(key: String, prev: Option[String]): Unit = prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
      restore(itemsKey, prevItems)
      restore(bitsKey, prevBits)
    }
  }
}
