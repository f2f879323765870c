package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.ml._
import graft.model.Star
import graft.sources.ConfigParsers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's CLI project lifecycle (`lcc/cli/lcc.py:10-46`,
  * `lcc/bin/{create_project,prepare_query,make_filter,filter_stars}.py`)
  * as a thin `main` over the library surface:
  *
  *   create-project <name> [path]        → project dirs + settings file
  *   prepare-query -o f -p k -r range …  → param-grid query/tuning file
  *   make-filter  -i tun -f D,… -s spec -c spec -t spec -d C,… -n name
  *   filter-stars -d conn -q file -f filter -r run
  *
  * Everything heavy (grid search, the search itself) is the already-
  * distributed library code; the CLI only parses files and flags. Project
  * settings are a java properties file (the Scala stand-in for the
  * reference's generated `project_settings.py`).
  */
object Main {

  final case class Settings(projectDir: String, inpLcs: String, tunParams: String,
                            queries: String, filters: String, results: String)

  private val dirKeys = Seq("INP_LCS" -> "inp_lcs", "TUN_PARAMS" -> "tun_params",
    "QUERIES" -> "queries", "FILTERS" -> "filters", "RESULTS" -> "query_results")

  def createProject(name: String, parent: String): Path = {
    val proj = Paths.get(parent, name)
    dirKeys.foreach { case (_, d) => Files.createDirectories(proj.resolve(d)) }
    val lines = s"project_dir=$proj" +:
      dirKeys.map { case (k, d) => s"$k=${proj.resolve(d)}" }
    Files.write(proj.resolve("project_settings.properties"), lines.asJava)
    proj
  }

  def loadSettings(projectDir: String): Settings = {
    val p = new java.util.Properties()
    val in = Files.newInputStream(
      Paths.get(projectDir, "project_settings.properties"))
    try p.load(in) finally in.close()
    def k(key: String) = Option(p.getProperty(key)).getOrElse(
      throw new IllegalArgumentException(s"$key missing from project settings"))
    Settings(k("project_dir"), k("INP_LCS"), k("TUN_PARAMS"),
      k("QUERIES"), k("FILTERS"), k("RESULTS"))
  }

  /** `-p name -r range` pairs → value lists with the reference
    * `prepare_query` semantics (`prepare_query.py:100-141`): `,`-enum;
    * single literal; `from:to[:step]` Python-range (EXCLUSIVE end) for
    * ints, `np.arange` for floats.
    */
  private[graft] def parseRange(r: String): Seq[String] =
    if (r.contains(",")) r.split(",").map(_.trim).toSeq
    else r.split(":") match {
      case Array(one) => Seq(one)
      case parts @ (Array(_, _) | Array(_, _, _)) =>
        val step = if (parts.length == 3) parts(2) else "1"
        val ints = (parts :+ step).forall(_.toIntOption.isDefined)
        if (ints) {
          val Seq(f, t, s) = Seq(parts(0), parts(1), step).map(_.toInt)
          (f until t by s).map(_.toString)
        } else {
          val Seq(f, t, s) = Seq(parts(0), parts(1), step).map(_.toDouble)
          // np.arange raises on step 0 — and (t-f)/0 would make n
          // Long.MaxValue here, failing later with an opaque NumericRange
          // size error instead of naming the bad input
          require(s != 0 && !s.isNaN, s"invalid step in range $r")
          // np.arange half-open float range: element i is f + i*s (one
          // rounding each, np.arange's arithmetic) — iterated addition
          // would accumulate FP error and can flip endpoint inclusion
          val n = math.ceil((t - f) / s).toLong max 0L
          (0L until n).map(i => (f + i * s).toString)
        }
      case _ => throw new IllegalArgumentException(s"Too many ':' in range $r")
    }

  def prepareQuery(settings: Settings, opts: Map[String, Seq[String]]): Path = {
    val params = opts.getOrElse("-p", Nil)
    val ranges = opts.getOrElse("-r", Nil)
    require(params.length == ranges.length,
      "Number of parameters and ranges have to be the same")
    val delim = opts.get("-d").flatMap(_.headOption).getOrElse(";")
    val dir = opts.get("-f").flatMap(_.headOption) match {
      case Some("t")   => settings.tunParams
      case Some("q")   => settings.queries
      case Some(other) => other
      case None        => settings.queries
    }
    val out = Paths.get(dir, opts("-o").head)
    // cartesian product in -p order (`get_combinations`)
    val rows = ranges.map(parseRange).foldLeft(Seq(Seq.empty[String])) {
      (acc, list) => for (prefix <- acc; v <- list) yield prefix :+ v
    }
    val lines = ("#" + params.mkString(delim)) +: rows.map(_.mkString(delim))
    Files.createDirectories(out.getParent)
    Files.write(out, lines.asJava)
    out
  }

  /** "`name[:N|%f]`" sample spec → a FileManager query over
    * `INP_LCS/name` (suffix sniffed from the directory contents), with the
    * sample restriction riding on `star_class` exactly as the reference
    * CLI passes it (`cli/stars_handling.py:124-170`).
    */
  private def sampleQuery(settings: Settings, spec: String): Map[String, String] = {
    val name = spec.split("[:%]")(0)
    val dir = Paths.get(settings.inpLcs, name)
    val listing = Files.list(dir)
    // materialize the listing before deciding: directory enumeration order
    // is filesystem-dependent, and a mixed dir must deterministically
    // prefer FITS over dat
    val names =
      try listing.iterator().asScala.map(_.toString).toVector
      finally listing.close()
    val suffix =
      if (names.exists(_.endsWith(".fits"))) "fits"
      else "dat"
    Map("path" -> dir.toString, "suffix" -> suffix, "star_class" -> spec)
  }

  private def loadSample(spark: SparkSession, settings: Settings, spec: String) =
    sources.StarsProvider.getProvider("FileManager")
      .getStars(spark, Seq(sources.QuerySpec(sampleQuery(settings, spec))))

  def makeFilter(spark: SparkSession, settings: Settings,
                 opts: Map[String, Seq[String]]): Path = {
    val descrNames = opts("-f").flatMap(_.split(",")).map(_.trim)
    val decNames = opts("-d").flatMap(_.split(",")).map(_.trim)
    val filterName = opts("-n").head
    val searched = loadSample(spark, settings, opts("-s").head).cache()
    val others = loadSample(spark, settings, opts("-c").head).cache()
    val templates: Registry.Templates = opts.get("-t").map(_.head) match {
      case Some(spec) => loadSample(spark, settings, spec).collect().toSeq
        .sortBy(_.starId)
        .map(s => (s.lightCurves.head.time, s.lightCurves.head.mag))
      case None => Nil
    }
    // tuning grid: each row of the `Class:param` file is one combination
    val combos = opts.get("-i").map(_.head) match {
      case Some(tunFile) =>
        val rows = ConfigParsers.readQueryFile(spark,
          Paths.get(settings.tunParams, tunFile).toString)
        val flat = rows.collect().toSeq.map(r =>
          rows.columns.zipWithIndex.map { case (c, i) => c -> r.getString(i) }.toMap)
        ConfigParsers.parseTunQuery(flat).zipWithIndex.map { case (byClass, i) =>
          TuneCombination(s"combo_$i",
            descrNames.map(n => Registry.descriptor(n, byClass.getOrElse(n, Map.empty), templates)),
            decNames.map(n => Registry.decider(n, byClass.getOrElse(n, Map.empty))))
        }
      case None => Seq(TuneCombination("default",
        descrNames.map(n => Registry.descriptor(n, Map.empty, templates)),
        decNames.map(n => Registry.decider(n, Map.empty))))
    }
    val (best, _) = new ParamsEstimator(searched.toDF(), others.toDF(), combos).fit()
    val out = Paths.get(settings.filters, filterName, s"$filterName.filter")
    FilterSerializer.save(best.model, out.toString)
    out
  }

  def filterStars(spark: SparkSession, settings: Settings,
                  opts: Map[String, Seq[String]]): Path = {
    val connector = opts("-d").head
    val runName = opts("-r").head
    val filterFile = opts("-f").head
    val stem = filterFile.stripSuffix(".filter")
    val filterPath = Seq(
      Paths.get(settings.filters, filterFile),
      Paths.get(settings.filters, stem, filterFile))
      .find(Files.exists(_)).getOrElse(
        throw new IllegalArgumentException(s"filter $filterFile not found"))
    val model = FilterSerializer.load(filterPath.toString)

    val qDf = ConfigParsers.readQueryFile(spark,
      Paths.get(settings.queries, opts("-q").head).toString)
    val cols = qDf.columns
    val queries = qDf
      .withColumn("params", map_from_arrays(
        array(cols.map(lit): _*), array(cols.map(col): _*)))
      // CONTENT-derived id, not monotonically_increasing_id: the resume
      // anti-join matches query_id across runs, and monotonic ids shift
      // with partitioning (core count, session) — a rerun on a different
      // layout would silently re-run every completed query. Identical
      // query lines collapse to one id, which is the same query anyway.
      .withColumn("query_id",
        concat(lit("q"), md5(to_json(col("params")))))
      .select(col("query_id"), col("params"))

    val runDir = Paths.get(settings.results, runName)
    val searcher = new StarsSearcher(model, connector,
      runDir.resolve("matched").toString, runDir.resolve("status").toString)
    searcher.queryStars(spark, queries)

    // reference sink parity: one FITS per matched star under `lcs/`
    // (`filter_stars.py` → `writeToFITS`); written per-partition on the
    // executors — no driver collect. The project dir is assumed to be a
    // SHARED filesystem (the reference CLI's contract too); each task
    // creates the dir itself so the write works wherever it runs.
    val lcsDir = runDir.resolve("lcs")
    Files.createDirectories(lcsDir)
    import spark.implicits._
    val lcsPath = lcsDir.toString
    spark.read.parquet(runDir.resolve("matched").toString).as[Star]
      .foreachPartition { (it: Iterator[Star]) =>
        Files.createDirectories(Paths.get(lcsPath))
        it.foreach { s =>
          Files.write(Paths.get(lcsPath, s"${s.starId}.fits"),
            sources.Fits.writeStar(s))
        }
      }
    runDir
  }

  /** `-x a -x b` style flags → multimap, positionals under "". */
  private[graft] def parseOpts(args: Seq[String]): Map[String, Seq[String]] = {
    val acc = scala.collection.mutable.Map.empty[String, Vector[String]]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("-") && i + 1 < args.length) {
        acc(a) = acc.getOrElse(a, Vector.empty) :+ args(i + 1); i += 2
      } else { acc("") = acc.getOrElse("", Vector.empty) :+ a; i += 1 }
    }
    acc.toMap
  }

  def run(spark: SparkSession, args: Array[String], cwd: String): Any = {
    require(args.nonEmpty,
      "Use one of: create-project, prepare-query, make-filter, filter-stars")
    val opts = parseOpts(args.toSeq.drop(1))
    args(0) match {
      case "create-project" =>
        val pos = opts.getOrElse("", Seq("project"))
        createProject(pos.head, if (pos.length > 1) pos(1) else cwd)
      case cmd =>
        val settings = loadSettings(
          opts.get("-P").flatMap(_.headOption).getOrElse(cwd))
        cmd match {
          case "prepare-query" => prepareQuery(settings, opts)
          case "make-filter"   => makeFilter(spark, settings, opts)
          case "filter-stars"  => filterStars(spark, settings, opts)
          case other => throw new IllegalArgumentException(s"Invalid option $other")
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-cli")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try println(run(spark, args, System.getProperty("user.dir")))
    finally spark.stop()
  }
}
