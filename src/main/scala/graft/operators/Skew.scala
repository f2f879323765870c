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

  /** Inner equi-join with a salted key: the build side is replicated once
    * per salt value and the join runs on (key, salt), so a hot key's rows
    * land on `salts` different reducers instead of one. Build-side cost is
    * a bounded ×`salts` blow-up, the price of removing the straggler; the
    * result set is exactly the plain join's — every probe row joins the
    * same replicated build rows whatever its salt.
    *
    * Pass `uniqueKey` (a column whose values are unique per row, e.g. an
    * id) to get a DETERMINISTIC salt that spreads even identical-content
    * rows. Without it the salt derives from `monotonically_increasing_id`,
    * which also spreads identical rows but is row-order-dependent: if the
    * probe is itself a nondeterministically-ordered shuffle output, a
    * partial stage recomputation could re-salt rows inconsistently —
    * prefer `uniqueKey` (or a storage-backed probe) in fault-tolerant
    * pipelines.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int, uniqueKey: Option[String] = None): DataFrame = {
    require(salts > 1, "salts must exceed 1")
    val saltExpr = uniqueKey match {
      case Some(u) => pmod(hash(col(u)), lit(salts))
      case None    => pmod(hash(monotonically_increasing_id()), lit(salts))
    }
    val salted = probe.withColumn("_salt", saltExpr)
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
