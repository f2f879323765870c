package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** CLI lifecycle e2e mirroring the reference's `test/cli/test_cli.py:15-129`:
  * create-project → prepare-query (tuning grid + query file) → make-filter
  * (grid-search over the bundled FITS samples) → filter-stars (searcher over
  * the fixture dirs, FITS-per-match sink). No network — FileManager only.
  */
class MainSpec extends SparkSpec {

  test("create-project → prepare-query → make-filter → filter-stars") {
    val base = Files.createTempDirectory("lcc_cli").toString

    // --- create-project ------------------------------------------------
    Main.run(spark, Array("create-project", "test_project", base), base)
    val proj = s"$base/test_project"
    assert(Files.exists(Paths.get(proj, "project_settings.properties")))
    assert(Files.isDirectory(Paths.get(proj, "filters")))

    // samples live in the project's inp_lcs, as the reference lays out
    val settings = Main.loadSettings(proj)
    for (s <- Seq("qso", "be_stars")) {
      val dst = Paths.get(settings.inpLcs, s)
      Files.createDirectories(dst)
      Files.list(Paths.get(s"/root/reference/sample/$s")).iterator().asScala
        .filter(_.toString.endsWith(".fits"))
        .foreach(f => Files.copy(f, dst.resolve(f.getFileName)))
    }

    // --- prepare-query: tuning grid (2 thresholds × 2 alphabet sizes) ---
    Main.run(spark, Array("prepare-query", "-P", proj,
      "-o", "tune_shape.txt", "-f", "t",
      "-p", "QDADec:threshold", "-r", "0.3,0.5",
      "-p", "HistShapeDescr:alphabet_size", "-r", "5:9:2"), proj)
    val tun = Paths.get(settings.tunParams, "tune_shape.txt")
    val tunLines = Files.readAllLines(tun).asScala
    assert(tunLines.head == "#QDADec:threshold;HistShapeDescr:alphabet_size")
    assert(tunLines.tail.length == 4, s"2×2 grid, got ${tunLines.tail}")
    assert(tunLines.tail.head == "0.3;5")

    // --- prepare-query: the search query file over the fixture dirs -----
    Main.run(spark, Array("prepare-query", "-P", proj,
      "-o", "query_files.txt", "-f", "q",
      "-p", "path", "-r", s"${settings.inpLcs}/qso,${settings.inpLcs}/be_stars",
      "-p", "suffix", "-r", "fits"), proj)
    val qLines = Files.readAllLines(
      Paths.get(settings.queries, "query_files.txt")).asScala
    assert(qLines.head == "#path;suffix" && qLines.tail.length == 2)

    // --- make-filter: grid-search, save the best model -------------------
    val filterPath = Main.run(spark, Array("make-filter", "-P", proj,
      "-i", "tune_shape.txt",
      "-f", "AbbeValueDescr,HistShapeDescr",
      "-s", "qso:15", "-c", "be_stars:15", "-t", "qso:3",
      "-d", "QDADec", "-n", "ShapeFilter"), proj)
    assert(Files.exists(
      Paths.get(settings.filters, "ShapeFilter", "ShapeFilter.filter")))
    assert(filterPath.toString.endsWith("ShapeFilter.filter"))

    // --- filter-stars: load the filter, run the search, FITS per match ---
    val runDir = Main.run(spark, Array("filter-stars", "-P", proj,
      "-d", "FileManager", "-q", "query_files.txt",
      "-f", "ShapeFilter.filter", "-r", "TestRun"), proj)
      .asInstanceOf[java.nio.file.Path]
    val status = spark.read.parquet(runDir.resolve("status").toString)
    assert(status.count() == 36, "status row per fetched sample star")
    val lcs = Files.list(runDir.resolve("lcs")).iterator().asScala.toSeq
    assert(lcs.nonEmpty, "at least one matched star saved as FITS")
    assert(lcs.forall(_.toString.endsWith(".fits")))
    // the FITS sink round-trips: read one back through the provider
    val back = sources.StarsProvider.getProvider("FileManager")
      .getStars(spark, Seq(sources.QuerySpec(Map(
        "path" -> runDir.resolve("lcs").toString, "suffix" -> "fits"))))
    assert(back.count() == lcs.length)
  }
}
