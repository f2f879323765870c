package graft.sources

import graft.SparkSpec
import graft.model.{Coordinates, LightCurveData, Star}
import graft.sources.ConfigParsers._
import graft.sources.QueryCompiler._

class ParsersSpec extends SparkSpec {
  import spark.implicits._

  test("ADQL compiler: equality, range, theta and quoting") {
    val sql = QueryCompiler.compile("II/264/asas3",
      Seq("ASAS", "Per", "Vmag"),
      Seq(Between("ra", 10.0, 10.5), Eq("cl", "qso 1"), Theta("mag", "<12.5")))
    assert(sql.startsWith("SELECT "))
    assert(sql.contains("\"ASAS\"") && sql.contains("FROM II/264/asas3"))
    assert(sql.contains("(ra BETWEEN 10.0 AND 10.5)"))
    assert(sql.contains("(cl = 'qso 1')")) // space triggers quoting
    assert(sql.contains("(mag <12.5)"))    // theta passes operator through
    assert(sql.contains(" AND "))
  }

  test("cone to box rewrite: arcsec to deg, no cos(dec) scaling") {
    val Seq(Between(_, raLo, raHi), Between(_, decLo, decHi)) =
      QueryCompiler.coneToBox("ra", "dec", 180.0, 45.0, 3600.0)
    assert(raLo == 179.0 && raHi == 181.0)
    assert(decLo == 44.0 && decHi == 46.0)
  }

  test("convertInputValue mirrors the reference's parse order") {
    assert(convertInputValue("True") == VBool(true))
    assert(convertInputValue("None") == VNone)
    assert(convertInputValue("42") == VInt(42))
    assert(convertInputValue("4.2") == VFloat(4.2))
    assert(convertInputValue("`raw`") == VStr("raw"))
    assert(convertInputValue("hello") == VStr("hello"))
  }

  test("parseQueryRanges: enum, int range, linspace") {
    val Seq(enum_, intRange, lin) =
      parseQueryRanges(Seq("a;b", "2:5", "0:1:3"))
    assert(enum_ == Seq(VStr("a"), VStr("b")))
    assert(intRange == Seq(VInt(2), VInt(3), VInt(4)))
    assert(lin == Seq(VFloat(0.0), VFloat(0.5), VFloat(1.0)))
  }

  test("parseTunQuery groups Class:param keys") {
    val parsed = parseTunQuery(Seq(Map(
      "AbbeValueDescr:bins" -> "100", "QDADec:threshold" -> "0.5")))
    assert(parsed.head("AbbeValueDescr")("bins") == VInt(100))
    assert(parsed.head("QDADec")("threshold") == VFloat(0.5))
  }

  test("getCombinations is the cartesian product in key order") {
    val combos = getCombinations(Seq("a", "b"),
      Seq(Seq(VInt(1), VInt(2)), Seq(VStr("x"))))
    assert(combos == Seq(Map("a" -> VInt(1), "b" -> VStr("x")),
      Map("a" -> VInt(2), "b" -> VStr("x"))))
  }

  test("query file reader: #-header, ;-delimited") {
    val f = java.nio.file.Files.createTempFile("queries", ".txt")
    java.nio.file.Files.writeString(f, "#ra;dec;target\n10.1;20.2;lmc\n11.5;21.0;smc\n")
    val df = readQueryFile(spark, f.toString)
    assert(df.columns.toSeq == Seq("ra", "dec", "target"))
    assert(df.count() == 2)
    assert(df.filter(df("target") === "smc").count() == 1)
  }

  test("crossmatch dedup collapses coordinate duplicates") {
    val stars = Seq(
      Star("a", Some(Coordinates(10.0, 20.0)), Map.empty, Map.empty, Map.empty, None, Nil),
      Star("b", Some(Coordinates(10.00005, 20.00005)), Map.empty, Map.empty, Map.empty, None, Nil),
      Star("c", Some(Coordinates(50.0, -10.0)), Map.empty, Map.empty, Map.empty, None, Nil)).toDF()
    val deduped = crossmatchDedup(stars)
    assert(deduped.select("starId").as[String].collect().toSet == Set("a", "c"))
  }

  test("crossmatch dedup collapses ident-sharing duplicates (star.py __eq__)") {
    val stars = Seq(
      // same MACHO ident, coordinates far apart (catalog disagreement)
      Star("a", Some(Coordinates(10.0, 20.0)), Map("MACHO" -> "1.2.3"),
        Map.empty, Map.empty, None, Nil),
      Star("b", Some(Coordinates(11.0, 21.0)), Map("MACHO" -> "1.2.3"),
        Map.empty, Map.empty, None, Nil),
      // same ident value under a DIFFERENT db key: not a duplicate
      Star("c", None, Map("OGLE" -> "1.2.3"), Map.empty, Map.empty, None, Nil),
      // null coordinates + shared ident: still collapses
      Star("d", None, Map("CRTS" -> "x9"), Map.empty, Map.empty, None, Nil),
      Star("e", None, Map("CRTS" -> "x9"), Map.empty, Map.empty, None, Nil)).toDF()
    val deduped = crossmatchDedup(stars)
    assert(deduped.select("starId").as[String].collect().toSet == Set("a", "c", "d"))
  }

  test("FITS writer round-trips through the reader") {
    val star = Star("test_1", Some(Coordinates(12.5, -30.25)),
      Map("MACHO" -> "1.2.3"), Map("MACHO:field" -> "1"),
      Map("vmag" -> "13.2"), Some("quasar"),
      Seq(LightCurveData(
        Array(1.0f.toDouble, 2.5f.toDouble, 4.0f.toDouble),
        Array(13.5f.toDouble, 13.6f.toDouble, 13.4f.toDouble),
        Array(0.1f.toDouble, 0.2f.toDouble, 0.1f.toDouble),
        Map("color" -> "B"))))
    val bytes = Fits.writeStar(star)
    assert(bytes.length % 2880 == 0)
    val back = Fits.readStar(bytes)
    assert(back.starId == star.starId)
    assert(back.coo.contains(Coordinates(12.5, -30.25)))
    assert(back.starClass.contains("quasar"))
    assert(back.identNames == Map("MACHO" -> "1.2.3"))
    assert(back.identIds == Map("MACHO:field" -> "1"))
    assert(back.more.get("vmag").contains("13.2"))
    assert(back.lightCurves.head.time.sameElements(star.lightCurves.head.time))
    assert(back.lightCurves.head.mag.sameElements(star.lightCurves.head.mag))
    assert(back.lightCurves.head.meta("color") == "B")
  }

  test("FITS writer round-trips curve origin and clamps over-long cards") {
    val longRemark = "x" * 120 // longer than an 80-char card can carry
    val star = Star("long_1", None, Map.empty, Map.empty,
      Map("remarks" -> longRemark), None,
      Seq(LightCurveData(Array(1.0, 2.0), Array(13.5, 13.6), Array(0.1, 0.1),
        Map("color" -> "V", "origin" -> "crts"))))
    val back = Fits.readStar(Fits.writeStar(star))
    // origin survives via DB_ORIGIN
    assert(back.lightCurves.head.meta("origin") == "crts")
    // over-long value truncates CLEANLY (closing quote intact — no mangled
    // leading-quote artifact), and the prefix is preserved
    val remark = back.more("remarks")
    assert(!remark.startsWith("'") && longRemark.startsWith(remark) &&
      remark.length > 50)
  }

  test("cross-database name parsers (Macho / OgleII conventions)") {
    assert(parseDbName("Macho", "1.4537.1642") ==
      Map("Field" -> "1", "Tile" -> "4537", "Seqn" -> "1642"))
    assert(parseDbName("OgleII", "LMC_SC1_152") ==
      Map("field" -> "LMC_SC1", "starid" -> "152"))
    assert(parseDbName("Macho", "weird") == Map.empty)
  }

  test("Kepler a..b range syntax becomes a Between condition") {
    assert(parseKeplerValue("kic_teff", "5000..6000") ==
      QueryCompiler.Between("kic_teff", 5000, 6000))
    assert(parseKeplerValue("kic_num", "757076") ==
      QueryCompiler.Eq("kic_num", "757076"))
  }

  test("JSON payload parse (Catalina dataSet0 shape) via from_json") {
    import org.apache.spark.sql.functions.{col, from_json}
    import org.apache.spark.sql.types._
    val payload = """{"ID":"1135075045477","RA":11.57,"Dec":-28.76,"V":13.2}"""
    val schema = StructType(Seq(StructField("ID", StringType),
      StructField("RA", DoubleType), StructField("Dec", DoubleType),
      StructField("V", DoubleType)))
    val parsed = Seq(payload).toDF("raw")
      .select(from_json(col("raw"), schema).as("star"))
      .select("star.*").head()
    assert(parsed.getString(0) == "1135075045477" && parsed.getDouble(1) == 11.57)
  }
}
