package graft.sources

import graft.functions.Kernels
import graft.model.{Coordinates, LightCurveData, Star}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Config-driven archive connector (SURVEY §2.1): the offline stand-in for
  * the reference's VizierTapBase/OGLE family (`vizier_tap_base.py:60-120`,
  * `ogleII.py`, `corot.py`). One implementation + per-archive
  * [[ArchiveConfig]] instances, exactly like the reference's config-only
  * subclasses (Asas/Macho/CorotBright are data, not code).
  *
  * The archive table is parquet (the remote TAP table's local stand-in);
  * query predicates become Catalyst filters — the SAME predicates
  * [[QueryCompiler]] renders as ADQL for a remote DataSource V2 scan, so
  * pushdown is exercised end to end: equality/range/cone-box reach
  * the parquet scan (PushedFilters), the SELECT set from
  * IDENT_MAP ∪ MORE_MAP ∪ {RA, DEC, LC} prunes the read schema
  * (`vizier_tap_base.py:170-179`), and the exact cone refine runs
  * post-scan (`base_query.py:38-83`).
  */
final case class ArchiveConfig(
    name: String,
    path: String => String,              // sfDir/base dir → parquet path
    raCol: String, decCol: String,
    identMap: Map[String, String],       // db → name column
    moreMap: Map[String, String],        // archive column → `more` key
    lcBands: Seq[(String, String, String, String)], // (timeCol, magCol, errCol, bandName)
    raScale: Double = 1.0,               // OGLE: ra stored in hours → ×15 (`ogleII.py:270`)
    errMagRatio: Double = 1.0,           // CorotFaint: err = raw/ratio (`corot.py`)
    maxBins: Option[Int] = None,         // CoRoT read-time downsample (`corot.py:107-112`)
    targets: Seq[String] = Nil,          // OGLE target fan-out (`ogleII.py:172-183`)
    targetCol: String = "target")

class ArchiveConnector(config: ArchiveConfig) extends StarsConnector {

  /** OGLE-style query rewrite (`_parseQueries`, `ogleII.py:159-199`): a
    * coordinate query without a target fans out to one query per target.
    */
  private def rewrite(q: QuerySpec): Seq[QuerySpec] =
    if (config.targets.nonEmpty && q.get("ra").isDefined && q.get(config.targetCol).isEmpty)
      config.targets.map(t => QuerySpec(q.params + (config.targetCol -> t)))
    else Seq(q)

  /** The ADQL this query would send to the remote TAP endpoint — the
    * pushdown seam made visible (`TAP_query.py:32-80`).
    */
  def toAdql(q: QuerySpec): String = {
    val select = (config.identMap.values ++ config.moreMap.keys ++
      Seq(config.raCol, config.decCol)).toSeq
    QueryCompiler.compile(config.name, select, conditions(q))
  }

  private def conditions(q: QuerySpec): Seq[QueryCompiler.Condition] = {
    val cone = for {
      ra <- q.double("ra")
      dec <- q.double("dec")
      delta <- q.double("delta")
    } yield QueryCompiler.coneToBox(config.raCol, config.decCol,
      ra / config.raScale, dec, delta) // ranges divided back like ogleII.py:109-111
    val eq = q.params.collect {
      case (k, v) if !Set("ra", "dec", "delta", "nearest").contains(k) =>
        QueryCompiler.Eq(k, v)
    }.toSeq
    cone.getOrElse(Nil) ++ eq
  }

  override def getStars(spark: SparkSession, queries: Seq[QuerySpec]): Dataset[Star] = {
    import spark.implicits._
    val dfs = queries.flatMap(rewrite).map { q =>
      var df = spark.read.parquet(config.path(q.get("base_dir").getOrElse("")))
      // predicate pushdown: the same conditions the ADQL would carry
      conditions(q).foreach {
        case QueryCompiler.Between(c, lo, hi) => df = df.filter(col(c).between(lo, hi))
        case QueryCompiler.Eq(c, v)           => df = df.filter(col(c) === v)
        case QueryCompiler.Theta(c, e)        => df = df.filter(expr(s"$c $e"))
      }
      // projection pushdown: IDENT ∪ MORE ∪ RA/DEC ∪ LC columns only
      val needed = (config.identMap.values ++ config.moreMap.keys ++
        Seq(config.raCol, config.decCol) ++
        config.lcBands.flatMap(b => Seq(b._1, b._2, b._3))).toSeq.distinct
      df = df.select(needed.map(col): _*)
      val stars = toStars(df)
      // exact cone refine + nearest on the materialized stars
      (q.double("ra"), q.double("dec"), q.double("delta")) match {
        case (Some(ra), Some(dec), Some(delta)) =>
          ConeSearch(stars.toDF(), ra, dec, delta / 3600.0,
            nearest = q.get("nearest").contains("true")).drop("dist_deg").as[Star]
        case _ => stars
      }
    }
    dfs.reduce(_ unionByName _)
  }

  private def toStars(df: DataFrame): Dataset[Star] = {
    val spark = df.sparkSession
    import spark.implicits._
    val cfg = config
    df.map { row =>
      def str(c: String): Option[String] =
        if (row.schema.fieldNames.contains(c) && !row.isNullAt(row.fieldIndex(c)))
          Some(row.get(row.fieldIndex(c)).toString)
        else None
      val identNames = cfg.identMap.flatMap { case (db, c) => str(c).map(db -> _) }
      val more = cfg.moreMap.flatMap { case (c, key) => str(c).map(key -> _) }
      val coo = for {
        ra <- str(cfg.raCol).flatMap(_.toDoubleOption)
        dec <- str(cfg.decCol).flatMap(_.toDoubleOption)
      } yield Coordinates(ra * cfg.raScale, dec)
      val lcs = cfg.lcBands.flatMap { case (tc, mc, ec, band) =>
        if (row.isNullAt(row.fieldIndex(tc))) None
        else {
          var t = row.getSeq[Double](row.fieldIndex(tc)).toArray
          var m = row.getSeq[Double](row.fieldIndex(mc)).toArray
          var e = row.getSeq[Double](row.fieldIndex(ec)).toArray
            .map(_ / cfg.errMagRatio)
          // source-side dimension reduction (`corot.py:107-112`)
          cfg.maxBins.filter(_ < t.length).foreach { mb =>
            val (tr, mr) = Kernels.ekviPaa(t, m, Some(mb.toDouble))
            val (_, er) = Kernels.ekviPaa(t, e, Some(mb.toDouble))
            t = tr; m = mr; e = er
          }
          val (ct, cm, ce) = Kernels.cleanLc(t, m, e)
          Some(LightCurveData(ct, cm, ce, Map("color" -> band, "origin" -> cfg.name)))
        }
      }
      Star(identNames.values.headOption.getOrElse("unknown"),
        coo, identNames, Map.empty, more, None, lcs)
    }
  }
}

/** Per-archive config instances — the offline analogs of the reference's
  * connector subclasses.
  */
object ArchiveConfigs {
  /** ASAS (`asas.py:8-69`): single V-band LC, period/var_type/JHK `more`. */
  def asas(base: String): ArchiveConfig = ArchiveConfig(
    name = "asas", path = _ => base,
    raCol = "RAJ2000", decCol = "DEJ2000",
    identMap = Map("asas" -> "ASAS"),
    moreMap = Map("Per" -> "period", "Class" -> "var_type", "Jmag" -> "j_mag"),
    lcBands = Seq(("lc_time", "lc_mag", "lc_err", "V")))

  /** MACHO (`macho.py:7-40`): two bands (R/B) per star. */
  def macho(base: String): ArchiveConfig = ArchiveConfig(
    name = "macho", path = _ => base,
    raCol = "RAJ2000", decCol = "DEJ2000",
    identMap = Map("macho" -> "MACHO"),
    moreMap = Map("Class" -> "var_type"),
    lcBands = Seq(("r_time", "r_mag", "r_err", "R"), ("b_time", "b_mag", "b_err", "B")))

  /** OGLE-II (`ogleII.py`): ra stored in hours (×15 on read), target
    * fan-out lmc/smc/bul for coordinate queries.
    */
  def ogleII(base: String): ArchiveConfig = ArchiveConfig(
    name = "ogleII", path = _ => base,
    raCol = "ra", decCol = "decl",
    identMap = Map("ogle" -> "starcat"),
    moreMap = Map("pgood" -> "pgood", "i_median" -> "i_mag"),
    lcBands = Seq(("lc_time", "lc_mag", "lc_err", "I")),
    raScale = 15.0,
    targets = Seq("lmc", "smc", "bul"))

  /** CoRoT bright (`corot.py:18-113`): read-time ekvi-PAA downsample to
    * max_bins = 1000.
    */
  def corotBright(base: String): ArchiveConfig = ArchiveConfig(
    name = "corot", path = _ => base,
    raCol = "RAJ2000", decCol = "DEJ2000",
    identMap = Map("corot" -> "CoRoT"),
    moreMap = Map("Vmag" -> "v_mag"),
    lcBands = Seq(("lc_time", "lc_mag", "lc_err", "white")),
    errMagRatio = 1.0,
    maxBins = Some(1000))
}
