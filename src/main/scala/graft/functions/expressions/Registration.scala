package graft.functions.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent SQL-function registration shared by every native-expression
  * object — ONE copy of the exists-check / createOrReplaceTempFunction /
  * synchronization logic instead of four drift-prone ones.
  */
object Registration {

  /** Register each (name, builder) unless the name already resolves.
    * Synchronized: concurrent callers (e.g. the bench warmup pool) must not
    * both pass the existence check and double-register (WARN spam).
    */
  def registerOnce(spark: SparkSession,
                   fns: (String, Seq[Expression] => Expression)*): Unit =
    synchronized {
      fns.foreach { case (name, builder) =>
        if (!spark.sessionState.functionRegistry
            .functionExists(FunctionIdentifier(name)))
          spark.sessionState.functionRegistry
            .createOrReplaceTempFunction(name, builder, "built-in")
      }
    }
}
