package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Z-order layout contract: the Column cascade computes the true Morton
  * interleave (bit-by-bit reference check), keys preserve locality
  * (coarse-cell prefix property), and the payoff is REAL — a box query
  * over a zcell-partitioned layout plans strictly fewer partitions than
  * the directory total while returning the exact unpartitioned answer.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit by bit — deliberately the naive
    * loop, independent of the mask-shift cascade under test.
    */
  private def refZkey(ra: Double, dec: Double): Long = {
    def q(v: Double, lo: Double, span: Double): Long =
      math.min(65535L, math.max(0L, math.floor((v - lo) * 65536.0 / span).toLong))
    val (qx, qy) = (q(ra, 0, 360), q(dec, -90, 180))
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | (((qx >> i) & 1L) << (2 * i)) | (((qy >> i) & 1L) << (2 * i + 1))
    }
  }

  test("zorderKey matches the bit-by-bit reference interleave") {
    val rng = new scala.util.Random(7)
    val pts = Seq.tabulate(500) { _ =>
      (rng.nextDouble() * 360.0, rng.nextDouble() * 180.0 - 90.0)
    } ++ Seq((0.0, -90.0), (359.999, 90.0), (360.0, 90.0), (180.0, 0.0))
    val got = pts.toDF("ra", "dec")
      .withColumn("zkey", Spatial.zorderKey(col("ra"), col("dec")))
      .select("ra", "dec", "zkey").as[(Double, Double, Long)].collect()
    got.foreach { case (ra, dec, z) =>
      assert(z == refZkey(ra, dec), s"cascade diverged from reference at ($ra, $dec)")
    }
  }

  test("coarse cell is the interleave of the per-axis cell prefixes (locality)") {
    // two points in the same 22.5°×11.25° coarse cell share a zcell;
    // crossing either axis's cell boundary changes it
    val a = refZkey(100.0, 10.0) >> 24
    val b = refZkey(110.0, 11.0) >> 24 // same 22.5°×11.25° cell as a
    val c = refZkey(130.0, 10.0) >> 24 // next ra cell
    val d = refZkey(100.0, 30.0) >> 24 // next dec cell
    assert(a == b, "nearby points must share the coarse cell")
    assert(a != c && a != d, "crossing a cell boundary must change the cell")
    // and zcellsForBox of a box inside one cell is exactly that cell
    assert(Spatial.zcellsForBox(100.0, 110.0, 10.0, 11.0) == Seq(a))
  }

  test("zcellsForBox covers the ra seam in every wrap spelling") {
    // a cone at ra≈0 reaches zcellsForBox either as ra±d (raLo < 0 —
    // q15's coneToBox arithmetic), as raHi > 360, or pre-wrapped as
    // raLo > raHi; clamping instead of wrapping would silently drop the
    // far-side cells — the superset contract must hold in all three
    val east = refZkey(1.0, 10.5) >> 24   // just past the seam
    val west = refZkey(359.0, 10.5) >> 24 // just before it
    assert(east != west, "seam test needs points in distinct cells")
    for ((lo, hi) <- Seq((-2.0, 2.0), (358.0, 362.0), (358.0, 2.0))) {
      val cells = Spatial.zcellsForBox(lo, hi, 10.0, 11.0)
      assert(cells.contains(east) && cells.contains(west),
        s"box ($lo, $hi) lost a seam side: $cells")
      assert(cells.distinct == cells, s"box ($lo, $hi) emitted duplicates")
    }
    // a full-circle span (radius past 180°) covers every ra cell at that dec
    assert(Spatial.zcellsForBox(-200.0, 200.0, 10.0, 11.0).size == 16)
    // and a non-wrapping box is unchanged by the decomposition
    assert(Spatial.zcellsForBox(100.0, 110.0, 10.0, 11.0).size == 1)
    // fully-out-of-range endpoints normalize by whole turns instead of
    // recursing forever: (370, 365) is the (10, 5) wrap, (0, -5) the
    // [0, 355] span, (-365, -361) the (-5, -1) → (355, 359) span
    val wrapped = Spatial.zcellsForBox(370.0, 365.0, 10.0, 11.0)
    assert(wrapped.toSet == Spatial.zcellsForBox(10.0, 5.0, 10.0, 11.0).toSet)
    assert(Spatial.zcellsForBox(0.0, -5.0, 10.0, 11.0).contains(east))
    assert(Spatial.zcellsForBox(-365.0, -361.0, 10.0, 11.0).toSet ==
      Spatial.zcellsForBox(355.0, 359.0, 10.0, 11.0).toSet)
  }

  /** Reference cell enumeration at `b` bits per axis — the naive
    * rectangle walk, independent of the quadtree under test.
    */
  private def refCells(raLo: Double, raHi: Double, decLo: Double,
                       decHi: Double, b: Int): Set[Long] = {
    def q(v: Double, lo: Double, span: Double): Long =
      math.min(65535L, math.max(0L, math.floor((v - lo) * 65536.0 / span).toLong))
    def inter(cx: Long, cy: Long): Long =
      (0 until b).foldLeft(0L) { (z, i) =>
        z | (((cx >> i) & 1L) << (2 * i)) | (((cy >> i) & 1L) << (2 * i + 1))
      }
    val s = 16 - b
    (for (cx <- (q(raLo, 0, 360) >> s) to (q(raHi, 0, 360) >> s);
          cy <- (q(decLo, -90, 180) >> s) to (q(decHi, -90, 180) >> s))
      yield inter(cx, cy)).toSet
  }

  test("zrangesForBox covers exactly the intersecting cells at the finer grid") {
    val rng = new scala.util.Random(11)
    val boxes = Seq.tabulate(40) { _ =>
      val raLo = rng.nextDouble() * 360.0
      val decLo = rng.nextDouble() * 170.0 - 90.0
      (raLo, raLo + rng.nextDouble() * 120.0,
        decLo, decLo + rng.nextDouble() * 60.0)
    } ++ Seq((-2.0, 2.0, 10.0, 11.0), (358.0, 362.0, -5.0, 5.0),
      (358.0, 2.0, 80.0, 90.0), (0.0, 360.0, -90.0, 90.0))
    for ((raLo, raHi, decLo, decHi) <- boxes; bits <- Seq(12, 16)) {
      val ranges = Spatial.zrangesForBox(raLo, raHi, decLo, decHi, bits)
      val covered = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
      // the wrap branches split at the seam; the reference enumerates the
      // same non-wrapping spans
      val spans: Seq[(Double, Double)] =
        if (raHi > 360.0) Seq((raLo, 360.0), (0.0, raHi - 360.0))
        else if (raLo < 0.0) Seq((raLo + 360.0, 360.0), (0.0, raHi))
        else if (raLo > raHi) Seq((raLo, 360.0), (0.0, raHi))
        else Seq((raLo, raHi))
      val expect = spans.flatMap { case (l, h) =>
        refCells(l, h, decLo, decHi, bits / 2) }.toSet
      assert(covered == expect,
        s"($raLo,$raHi,$decLo,$decHi)@$bits: ranges cover ${covered.size} " +
          s"cells, expected ${expect.size}")
      // maximal ranges: sorted, disjoint, non-adjacent
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, s"unmerged ranges: $ranges")
        case _ =>
      }
    }
  }

  test("range decomposition is O(perimeter): far fewer ranges than cells on a big box") {
    // a wide thin diagonal-spanning box at the 256×256 grid: the
    // rectangle enumeration pays one entry per CELL; the quadtree pays
    // one per maximal z range
    val (raLo, raHi, decLo, decHi) = (30.0, 330.0, -80.0, 80.0)
    val ranges = Spatial.zrangesForBox(raLo, raHi, decLo, decHi, 16)
    val cells = refCells(raLo, raHi, decLo, decHi, 8)
    assert(ranges.map { case (l, h) => h - l + 1 }.sum == cells.size,
      "range decomposition must cover exactly the rectangle's cells")
    assert(ranges.length < cells.size / 10,
      s"expected O(perimeter) ranges, got ${ranges.length} for ${cells.size} cells")
  }

  test("q105 equals the plain box filter (cell-to-stored-zkey conversion exact)") {
    // the driver oracle proves this offline at sf0.01/0.1; this is the
    // in-CI guard for the (lo << shift, ((hi+1) << shift) - 1) bound
    // arithmetic — an off-by-one there passes every plan-shape assert
    // but drops box rows
    val dir = "/root/testdata/sf0.001"
    val (raLo, raHi, decLo, decHi) = Spatial.BoxQ105
    val got = Spatial.queries("q105_zrange_box")(spark, dir)
      .select("o_orderkey").as[Long].collect().toSet
    val expect = Spatial.q98ZorderLayout(spark, dir)
      .filter(col("ra").between(raLo, raHi) && col("dec").between(decLo, decHi))
      .select("o_orderkey").as[Long].collect().toSet
    assert(got == expect,
      s"q105 diverged from the plain box filter: missing ${expect -- got}, extra ${got -- expect}")
    assert(got.nonEmpty, "fixture sanity: the box must select rows")
  }

  test("box query over a FINE-grid range layout prunes partitions, exact answer") {
    // the 12-bit variant of the pruning test: partition by the 12-bit
    // cell, push the zrangesForBox ranges as between-predicates
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("zorder12").toString
    val keyed = Spatial.q98ZorderLayout(spark, dir)
      .withColumn("zcell12", org.apache.spark.sql.functions.shiftright(col("zkey"), 20))
    keyed.write.partitionBy("zcell12").mode("overwrite").parquet(s"$tmp/orders_z12")

    val (raLo, raHi, decLo, decHi) = Spatial.BoxQ105
    val ranges = Spatial.zrangesForBox(raLo, raHi, decLo, decHi, 12)
    val layout = spark.read.parquet(s"$tmp/orders_z12")
    val totalCells = layout.select("zcell12").distinct().count()
    val rangeCond = ranges.map { case (lo, hi) => col("zcell12").between(lo, hi) }
      .reduce(_ || _)
    val pruned = layout.filter(rangeCond)
      .filter(col("ra").between(raLo, raHi) && col("dec").between(decLo, decHi))
    val exact = keyed
      .filter(col("ra").between(raLo, raHi) && col("dec").between(decLo, decHi))
      .select("o_orderkey").as[Long].collect().toSet
    assert(pruned.select("o_orderkey").as[Long].collect().toSet == exact,
      "fine-grid pruned answer diverged from the exact box filter")
    val scans = pruned.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    assert(scans.nonEmpty, "no file scan in the plan")
    val selected = scans.map(_.selectedPartitions.partitionCount).sum
    assert(selected < totalCells,
      s"scan selected $selected of $totalCells partitions — ranges did not prune")
  }

  test("box query over the zcell layout prunes partitions and matches the exact answer") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val keyed = Spatial.q98ZorderLayout(spark, dir)
    keyed.write.partitionBy("zcell").mode("overwrite").parquet(s"$tmp/orders_z")

    val (raLo, raHi, decLo, decHi) = Spatial.BoxQ105
    val cells = Spatial.zcellsForBox(raLo, raHi, decLo, decHi)
    val layout = spark.read.parquet(s"$tmp/orders_z")
    val totalCells = layout.select("zcell").distinct().count()
    assert(cells.length < totalCells,
      s"box resolved ${cells.length} cells of $totalCells — no pruning possible")

    val pruned = layout
      .filter(col("zcell").isin(cells: _*))
      .filter(col("ra").between(raLo, raHi) && col("dec").between(decLo, decHi))
    // the CELL SET is a superset guarantee: the cell filter alone must
    // already contain every box row (no false negatives at the coarse
    // grid), the exact filter only trims the cell residue
    val exact = keyed
      .filter(col("ra").between(raLo, raHi) && col("dec").between(decLo, decHi))
      .select("o_orderkey").as[Long].collect().toSet
    val got = pruned.select("o_orderkey").as[Long].collect().toSet
    assert(got == exact, "pruned layout answer diverged from the exact box filter")

    // and the catalog really pruned: the scan's selected partitions are
    // the box's cells (∩ cells present), strictly under the total
    val scans = pruned.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    assert(scans.nonEmpty, "no file scan in the plan")
    val selected = scans.map(_.selectedPartitions.partitionCount).sum
    assert(selected <= cells.length && selected < totalCells,
      s"scan selected $selected partitions (cells=${cells.length}, total=$totalCells)")
  }
}
