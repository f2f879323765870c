package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for selected SparkEntry queries
  * to files — the optimization-round evidence trail (plans/rNN/<q>_before
  * /_after.txt). Usage:
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> [q45,q58,...]"
  *
  * Queries whose construction is eager (budget estimates, connected
  * components) run those jobs during the dump; the captured plan is the
  * FINAL returned DataFrame's, which is what the bench materializes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only = if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.exists(kv._1.startsWith)))
      .foreach { case (name, fn) =>
        try {
          val txt = CacheScope.run {
            fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          }
          spark.catalog.clearCache()
          val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt", "UTF-8")
          try w.println(txt) finally w.close()
          System.err.println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
