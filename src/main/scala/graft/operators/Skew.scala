package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys. AQE's skew-join handles
  * sort-merge spills at runtime, but when a handful of keys dominate (the
  * "null island" / default-value problem of real corpora) the standard
  * pre-emptive fix is salting: spread each hot key over `salts` reducer
  * slots by widening the join key with a salt column.
  */
object Skew {

  /** Inner equi-join with a salted key: every probe row gets a
    * DETERMINISTIC salt (hash of its full row, mod `salts`), the build
    * side is replicated once per salt value, and the join runs on
    * (key, salt) — a hot key's rows land on `salts` different reducers
    * instead of one. Build-side cost is a bounded ×`salts` blow-up, the
    * price of removing the straggler; the result set is exactly the plain
    * join's. Use when the build side is too big to broadcast but small
    * enough to replicate `salts` times.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 1, "salts must exceed 1")
    val probeCols = probe.columns
    // salt = hash(row, row-id): the row-id term spreads EXACT-duplicate
    // hot rows too (hash of the row alone would send a million identical
    // "null island" rows to one reducer — the case salting exists for).
    // Placement does not need determinism across retries for correctness;
    // every row joins the same replicated build rows whatever its salt.
    val salted = probe.withColumn("_salt",
      pmod(hash(struct(probeCols.map(col): _*), monotonically_increasing_id()),
        lit(salts)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
