package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's OWN bloom-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * behind Catalyst's runtime row-level filtering, which exposes no public
  * function names in OSS Spark). Registering them makes the distributed
  * sketch build (`bloom_agg`: map-side partial blooms OR-merged by the
  * aggregate — the driver only ever sees the final `numBits/8`-byte
  * array) and the codegen'd membership probe (`might_contain`) available
  * to the bloom-gate operators and to pure-SQL callers.
  *
  * Both take pre-hashed LONG values (`xxhash64(col)`) — the same
  * convention Catalyst's injected runtime filters use, so build and probe
  * can never disagree on the hash.
  */
object BloomFns {

  /** `bloom_agg(xxhash64(v), estItems, numBits)` → binary sketch. */
  val bloomAggBuilder: Seq[Expression] => Expression = {
    case Seq(child, est, bits) => new BloomFilterAggregate(child, est, bits)
    case exprs => throw new IllegalArgumentException(
      s"bloom_agg expects (hashedValue, estItems, numBits), got ${exprs.length} args")
  }

  /** `might_contain(bloomBinary, xxhash64(v))` → boolean (no false
    * negatives; false-positive rate set by the build dials).
    */
  val mightContainBuilder: Seq[Expression] => Expression = {
    case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
    case exprs => throw new IllegalArgumentException(
      s"might_contain expects (bloomBinary, hashedValue), got ${exprs.length} args")
  }

  def register(spark: SparkSession): Unit =
    Registration.registerOnce(spark,
      "bloom_agg" -> bloomAggBuilder,
      "might_contain" -> mightContainBuilder)
}
