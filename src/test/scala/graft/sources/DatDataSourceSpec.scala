package graft.sources

import graft.SparkSpec
import graft.model.Star
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSource V2 dat source: correctness vs the FileManager path, and the
  * REAL pushdown: starId predicates prune to matching files at planning
  * time, projections prune the read schema.
  */
class DatDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.DatDataSource"

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("datv2")
    (1 to 20).foreach { i =>
      val body = new StringBuilder("#t m e\n")
      (0 until 50).foreach(j => body ++= s"$j.0 ${14.0 + (i + j) % 5 * 0.1} 0.3\n")
      java.nio.file.Files.writeString(d.resolve(f"star_$i%02d.dat"), body.toString)
    }
    d.toString
  }

  private def scanPartitions(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }.getOrElse(fail("no BatchScanExec in plan"))

  test("v2 source reads the same stars as the FileManager connector") {
    val v2 = spark.read.format(fmt).load(dir).as[Star].collect().sortBy(_.starId)
    val fm = StarsProvider.getProvider("FileManager")
      .getStars(spark, Seq(QuerySpec(Map("path" -> dir, "suffix" -> "dat"))))
      .collect().sortBy(_.starId)
    assert(v2.length == 20 && fm.length == 20)
    v2.zip(fm).foreach { case (a, b) =>
      assert(a.starId == b.starId)
      assert(a.lightCurves.head.mag.sameElements(b.lightCurves.head.mag))
    }
  }

  test("starId equality prunes to ONE file at planning time") {
    val one = spark.read.format(fmt).load(dir).filter(col("starId") === "star_07")
    assert(scanPartitions(one) == 1, "equality must prune to one input partition")
    assert(one.as[Star].collect().map(_.starId).toSeq == Seq("star_07"))

    val in = spark.read.format(fmt).load(dir)
      .filter(col("starId").isin("star_01", "star_02", "star_19"))
    assert(scanPartitions(in) == 3, "IN must prune to the member files")
    assert(in.count() == 3)

    val prefix = spark.read.format(fmt).load(dir)
      .filter(col("starId").startsWith("star_1"))
    assert(scanPartitions(prefix) == 10, "prefix must prune to matching files")
  }

  test("column pruning reaches the scan (no curve parse for id-only reads)") {
    val ids = spark.read.format(fmt).load(dir).select("starId")
    val plan = ids.queryExecution.executedPlan.toString
    assert(!plan.contains("lightCurves"), "pruned scan must not carry lightCurves:\n" + plan)
    assert(ids.as[String].collect().length == 20)
    // residual (non-starId) filters still evaluated by Spark post-scan
    val residual = spark.read.format(fmt).load(dir)
      .filter(col("starId") === "star_03" && size(col("lightCurves")) > 0)
    assert(residual.count() == 1)
  }
}
