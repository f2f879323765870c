package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Archive connectors: pushdown, config maps, ra scaling, band splitting,
  * target fan-out, read-time downsampling, ADQL rendering.
  */
class ArchiveConnectorSpec extends SparkSpec {
  import spark.implicits._

  private lazy val machoDir = {
    val dir = java.nio.file.Files.createTempDirectory("macho").toString
    Seq(
      ("1.33.10", 10.0, 20.0, "qso",
        Seq(1.0, 2.0, 3.0), Seq(14.1, 14.2, 14.3), Seq(0.1, 0.1, 0.1),
        Seq(1.0, 2.0), Seq(15.1, 15.2), Seq(0.2, 0.2)),
      ("1.33.11", 10.2, 20.2, "be",
        Seq(1.0, 2.0), Seq(13.0, 13.1), Seq(0.1, 0.1),
        Seq(1.0, 2.0), Seq(14.0, 14.1), Seq(0.1, 0.1)),
      ("2.40.5", 80.0, -30.0, "qso",
        Seq(1.0, 2.0), Seq(12.0, 12.1), Seq(0.1, 0.1),
        Seq(1.0, 2.0), Seq(12.5, 12.6), Seq(0.1, 0.1)))
      .toDF("MACHO", "RAJ2000", "DEJ2000", "Class",
        "r_time", "r_mag", "r_err", "b_time", "b_mag", "b_err")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("macho config: two-band split, ident/more maps, cone + nearest") {
    val conn = new ArchiveConnector(ArchiveConfigs.macho(machoDir))
    val all = conn.getStars(spark, Seq(QuerySpec(Map.empty))).collect()
    assert(all.length == 3)
    val s = all.find(_.starId == "1.33.10").get
    assert(s.lightCurves.map(_.meta("color")) == Seq("R", "B"))
    assert(s.lightCurves.head.mag.length == 3)
    assert(s.more("var_type") == "qso")
    assert(s.identNames == Map("macho" -> "1.33.10"))

    val cone = conn.getStars(spark, Seq(QuerySpec(Map(
      "ra" -> "10.0", "dec" -> "20.0", "delta" -> "3600")))).collect()
    assert(cone.map(_.starId).toSet == Set("1.33.10", "1.33.11"))
    val nearest = conn.getStars(spark, Seq(QuerySpec(Map(
      "ra" -> "10.1", "dec" -> "20.1", "delta" -> "7200", "nearest" -> "true")))).collect()
    assert(nearest.length == 1)
  }

  test("cone box predicates reach the parquet scan (pushdown)") {
    val conn = new ArchiveConnector(ArchiveConfigs.macho(machoDir))
    val ds = conn.getStars(spark, Seq(QuerySpec(Map(
      "ra" -> "10.0", "dec" -> "20.0", "delta" -> "3600"))))
    val plan = ds.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(RAJ2000"), "box filter not pushed:\n" + plan)
  }

  test("ogleII config: ra hours -> degrees, target fan-out") {
    val dir = java.nio.file.Files.createTempDirectory("ogle").toString
    Seq(
      ("lmc_sc1_100", 0.7, -69.0, "lmc", 0.98, 14.5,
        Seq(1.0, 2.0), Seq(14.5, 14.6), Seq(0.1, 0.1)),
      ("smc_sc2_200", 0.8, -73.0, "smc", 0.97, 15.0,
        Seq(1.0, 2.0), Seq(15.0, 15.1), Seq(0.1, 0.1)))
      .toDF("starcat", "ra", "decl", "target", "pgood", "i_median",
        "lc_time", "lc_mag", "lc_err")
      .write.mode("overwrite").parquet(dir)
    val conn = new ArchiveConnector(ArchiveConfigs.ogleII(dir))
    // coordinate query with no target fans out over lmc/smc/bul and unions
    val found = conn.getStars(spark, Seq(QuerySpec(Map(
      "ra" -> "10.5", "dec" -> "-69.0", "delta" -> "7200")))).collect()
    assert(found.length == 1 && found.head.starId == "lmc_sc1_100")
    // ra stored in hours: 0.7h * 15 = 10.5 deg
    assert(math.abs(found.head.coo.get.ra - 10.5) < 1e-9)
  }

  test("corot config: read-time downsample bounds curve length") {
    val dir = java.nio.file.Files.createTempDirectory("corot").toString
    val n = 5000
    Seq(("c1", 100.0, 0.0, 12.0,
      (1 to n).map(_.toDouble), (1 to n).map(i => 12.0 + (i % 7) * 0.01),
      (1 to n).map(_ => 0.01)))
      .toDF("CoRoT", "RAJ2000", "DEJ2000", "Vmag", "lc_time", "lc_mag", "lc_err")
      .write.mode("overwrite").parquet(dir)
    val conn = new ArchiveConnector(ArchiveConfigs.corotBright(dir))
    val s = conn.getStars(spark, Seq(QuerySpec(Map.empty))).head()
    assert(s.lightCurves.head.mag.length == 1000, // max_bins
      s"expected 1000 bins, got ${s.lightCurves.head.mag.length}")
  }

  test("ADQL rendering of the pushed predicates") {
    val conn = new ArchiveConnector(ArchiveConfigs.asas(machoDir))
    val adql = conn.toAdql(QuerySpec(Map(
      "ra" -> "10.0", "dec" -> "20.0", "delta" -> "3600", "Class" -> "qso")))
    assert(adql.startsWith("SELECT "))
    assert(adql.contains("FROM asas"))
    assert(adql.contains("(RAJ2000 BETWEEN 9.0 AND 11.0)"))
    assert(adql.contains("(DEJ2000 BETWEEN 19.0 AND 21.0)"))
    assert(adql.contains("(Class = qso)"))
  }
}
