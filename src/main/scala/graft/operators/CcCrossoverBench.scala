package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the CC boundary tiers at REAL cut sizes (dev tool, run on
  * demand; results recorded in SCALE.md): synthesizes boundary graphs of
  * controlled size and times the driver union-find tier against the
  * distributed min-label propagation tier on the SAME graph.
  *
  * Generator: `C` path components of 5 nodes each (the dedup shape — many
  * small clusters, each cut by partition boundaries), edges shuffled
  * round-robin over the partitions so partition-local contraction leaves
  * ~4C fragment links = the boundary graph. A fixed chain-of-length-100
  * case runs at the end to expose the propagation tier's round-count
  * sensitivity to component diameter (the driver tier is
  * diameter-blind).
  *
  * Usage: runMain graft.operators.CcCrossoverBench [targetEdges ...]
  * (each argument a numeric boundary-edge target).
  */
object CcCrossoverBench {

  private def pathEdges(spark: SparkSession, comps: Long, len: Int) = {
    val n = len + 1 // nodes per component
    val edges = spark.range(0, comps * n)
      .filter(col("id") % n =!= len)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
      .repartition(32) // round-robin: fragments every component
    val nodes = spark.range(0, comps * n).select(col("id"))
    (edges, nodes)
  }

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val out = work
    (out, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val targets = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(1000L, 100000L, 1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: codegen + shuffle machinery on a tiny graph, both tiers
    for (maxE <- Seq(Long.MaxValue, -1L)) {
      val (e, nd) = pathEdges(spark, 100, 4)
      Dedup.connectedComponents(e, nd, maxE).count()
    }

    println("target_edges,tier,boundary_edges,secs,components")
    for (target <- targets; (tierName, maxE) <-
           Seq("driver" -> Long.MaxValue, "distributed" -> -1L)) {
      val comps = math.max(target / 4, 1L)
      val (edges, nodes) = pathEdges(spark, comps, 4)
      graft.Telemetry.drain()
      val (labels, secs) = time {
        Dedup.connectedComponents(edges, nodes, maxE)
          .agg(countDistinct(col("label"))).head().getLong(0)
      }
      val boundary = graft.Telemetry.drain()
        .collectFirst { case e if e.contains("boundary_edges=") =>
          e.split("boundary_edges=")(1).split(" ")(0) }.getOrElse("?")
      assert(labels == comps, s"wrong component count: $labels != $comps")
      println(f"$target,$tierName,$boundary,$secs%.2f,$labels")
    }

    // diameter sensitivity: one 10^5-edge graph as 1000 chains of length
    // 100 — propagation pays rounds ∝ log(diameter), the driver tier not
    for ((tierName, maxE) <- Seq("driver" -> Long.MaxValue, "distributed" -> -1L)) {
      val (edges, nodes) = pathEdges(spark, 1000, 100)
      graft.Telemetry.drain()
      val (labels, secs) = time {
        Dedup.connectedComponents(edges, nodes, maxE)
          .agg(countDistinct(col("label"))).head().getLong(0)
      }
      val boundary = graft.Telemetry.drain()
        .collectFirst { case e if e.contains("boundary_edges=") =>
          e.split("boundary_edges=")(1).split(" ")(0) }.getOrElse("?")
      println(f"chain100,$tierName,$boundary,$secs%.2f,$labels")
    }
    spark.stop()
  }
}
