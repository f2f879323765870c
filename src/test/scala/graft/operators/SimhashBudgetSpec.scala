package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The candidate-pair budget guard: the r15 capacity ladder measured the
  * 16-bit banding dial going quadratic on a token-soup corpus (500k docs
  * ran >13 minutes before being killed; h≤3 over 48 bits at 5M priced
  * ~12B pairs) — a silent disk-filler. The guard prices the band-bucket
  * expansion with one aggregate BEFORE the join and refuses past
  * `spark.graft.dedup.candidatePairBudget`, naming the remedy the ladder
  * measured (widen bits / tighten maxHamming). These tests pin: the
  * refusal fires exactly on the corpus shape the ladder measured the
  * runaway on, the estimate is the true pre-distinct join volume, the
  * fixture dials stay far under the default budget, and ≤0 disables.
  */
class SimhashBudgetSpec extends SparkSpec {
  import spark.implicits._

  /** The ladder's runaway shape in miniature: unrelated docs over a tiny
    * vocabulary, so 16-bit band buckets are dense collision sets.
    */
  private def soup = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val rnd = new scala.util.Random(11)
    (0 until 400).map { i =>
      (i.toLong, (0 until 30).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "), "en")
    }.toDF("doc_id", "text", "lang")
  }

  private def withBudget[A](b: Option[Long])(f: => A): A = {
    b match {
      case Some(v) => spark.conf.set(Dedup.CANDIDATE_PAIR_BUDGET_CONF, v.toString)
      case None    => spark.conf.unset(Dedup.CANDIDATE_PAIR_BUDGET_CONF)
    }
    try f finally spark.conf.unset(Dedup.CANDIDATE_PAIR_BUDGET_CONF)
  }

  test("saturated band buckets refuse before expanding the quadratic join") {
    val d = soup.cache()
    val ex = withBudget(Some(1000L)) {
      intercept[IllegalStateException] {
        Dedup.simhashNearDupPairs(d, bits = 16, maxHamming = 2)
      }
    }
    assert(ex.getMessage.contains(Dedup.CANDIDATE_PAIR_BUDGET_CONF))
    assert(ex.getMessage.contains("Widen bits"))
    // the measured remedy: the SAME corpus at 48 bits passes the SAME
    // budget — wider buckets collapse the collision sets (the ladder's
    // 31 s h<=1 rung vs the killed 16-bit one)
    withBudget(Some(1000L)) {
      Dedup.simhashNearDupPairs(d, bits = 48, maxHamming = 1).count()
    }
  }

  test("opt-in autoWiden re-signs at 48 bits instead of refusing; default refuses") {
    val d = soup.cache()
    // budget between the two widths' estimates on this corpus: 16-bit
    // expands ~80k pairs (refused), 48-bit/h=2 ~6.1k (passes) — so the
    // widen is exercised against a budget BOTH attempts are priced on
    val budget = 8000L
    // default: the refusal contract is unchanged (the first test pins it
    // too — this re-states it right next to the opt-in that bends it)
    withBudget(Some(budget)) {
      intercept[IllegalStateException] {
        Dedup.simhashNearDupPairs(d, bits = 16, maxHamming = 2)
      }
    }
    // ground truth: the measured remedy applied by hand
    val expected = withBudget(Some(budget)) {
      graft.CacheScope.run {
        Dedup.simhashNearDupPairs(d, bits = Dedup.AUTO_WIDEN_BITS, maxHamming = 2)
          .collect().map(_.toSeq).toSet
      }
    }
    spark.conf.set(Dedup.AUTO_WIDEN_CONF, "true")
    try {
      graft.Telemetry.drain()
      val got = withBudget(Some(budget)) {
        graft.CacheScope.run {
          Dedup.simhashNearDupPairs(d, bits = 16, maxHamming = 2)
            .collect().map(_.toSeq).toSet
        }
      }
      val evs = graft.Telemetry.drain()
      assert(evs.exists(_.contains("dedup autowiden bits=16->48")),
        s"the widen decision must be telemetried: $evs")
      assert(got == expected,
        "autoWiden output must equal the hand-applied 48-bit remedy")
    } finally spark.conf.unset(Dedup.AUTO_WIDEN_CONF)
  }

  test("estimate equals the pre-distinct volume of the band self-join") {
    val d = soup.cache()
    graft.functions.expressions.SignatureExprs.register(spark)
    val sim = d.select(col("doc_id"), col("lang"),
      expr("simhash_bits(split(text, ' '), 16)").as("simhash"))
    val est = Dedup.estimatedBandPairs(
      sim.select(col("doc_id"), col("lang"),
        explode(array(Dedup.simhashBandDefs(16, 2).map {
          case (b, off, mask) => struct(lit(b).as("band"),
            shiftright(col("simhash"), off).bitwiseAND(lit(mask)).as("bits"))
        }: _*)).as("bd")).select(col("doc_id"), col("lang"), col("bd.*")))
    // ground truth: the a<b self-join WITHOUT distinct, counted per band
    val bands = sim.select(col("doc_id"), col("lang"),
      explode(array(Dedup.simhashBandDefs(16, 2).map {
        case (b, off, mask) => struct(lit(b).as("band"),
          shiftright(col("simhash"), off).bitwiseAND(lit(mask)).as("bits"))
      }: _*)).as("bd")).select(col("doc_id"), col("lang"), col("bd.*"))
    val joined = bands.alias("x").join(bands.alias("y"),
      col("x.lang") === col("y.lang") && col("x.band") === col("y.band") &&
        col("x.bits") === col("y.bits") && col("x.doc_id") < col("y.doc_id")).count()
    assert(est == joined.toDouble,
      s"estimate $est != pre-distinct join volume $joined")
  }

  test("fixture dials stay under the default budget; <=0 disables the guard") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // q47's dial on the fixture corpus: must construct without refusal
    // under the DEFAULT budget (this is the guard's false-positive gate)
    Dedup.simhashNearDupPairs(d, 16, 2).count()
    // disabled: the soup corpus that refused above now expands
    withBudget(Some(0L)) {
      assert(Dedup.simhashNearDupPairs(soup, 16, 2).count() >= 0)
    }
  }
}
