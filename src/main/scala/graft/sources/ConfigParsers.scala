package graft.sources

import graft.model.Star
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side config/query-file parsing (SURVEY §2.7):
  * `convert_input_value` (`utils/helpers.py:246-272`), `parse_query_ranges`
  * (`cli/input_parse.py:9-54`), `parse_tun_query` (`:56-110`),
  * `get_combinations` (`utils/helpers.py:204-233`), and the `#`-headed
  * `;`-delimited query/status files (`data_manager/status_resolver.py`).
  */
object ConfigParsers {

  /** Typed config value (the reference returns python bool/None/int/float/str). */
  sealed trait Value
  case object VNone extends Value
  final case class VBool(b: Boolean) extends Value
  final case class VInt(i: Long) extends Value
  final case class VFloat(d: Double) extends Value
  final case class VStr(s: String) extends Value

  /** `convert_input_value`: "True"/"False"/"None" literals, then int, then
    * float (only when a '.' is present, like the reference), else string.
    * Backtick literals are passed through as strings (no eval).
    */
  def convertInputValue(raw: String): Value = {
    val value = raw.trim
    value match {
      case "True"  => VBool(true)
      case "False" => VBool(false)
      case "None"  => VNone
      case v if v.startsWith("`") && v.endsWith("`") => VStr(v.substring(1, v.length - 1))
      case v if v.contains(".") =>
        v.toDoubleOption.map(VFloat).getOrElse(VStr(v))
      case v =>
        v.toLongOption.map(VInt).getOrElse(
          v.toDoubleOption.map(VFloat).getOrElse(VStr(v)))
    }
  }

  /** `parse_query_ranges`: "a;b;c" enumeration, "from:to" int range,
    * "from:to:steps" linspace.
    */
  def parseQueryRanges(rawParams: Seq[String], splitBy: String = ":",
                       enumBy: String = ";"): Seq[Seq[Value]] =
    rawParams.map { params =>
      val parts = params.split(splitBy, -1).map(_.trim)
      parts.length match {
        case 1 => params.split(enumBy, -1).toSeq.map(convertInputValue)
        case 2 =>
          val (from, to) = (parts(0).toInt, parts(1).toInt)
          (from until to).map(i => VInt(i.toLong))
        case 3 =>
          val (from, to, steps) = (parts(0).toDouble, parts(1).toDouble, parts(2).toDouble)
          val n = steps.toInt
          // np.linspace inclusive endpoints
          (0 until n).map(i => VFloat(
            if (n == 1) from else from + i * (to - from) / (n - 1)))
        case _ => throw new IllegalArgumentException(
          s"Too many separation symbols in $params")
      }
    }

  /** `parse_tun_query`: flat "Class:param" keys → per-class param maps. */
  def parseTunQuery(flat: Seq[Map[String, String]]): Seq[Map[String, Map[String, Value]]] =
    flat.map { row =>
      row.toSeq.groupBy(_._1.split(":", 2)(0)).map { case (cls, kvs) =>
        cls -> kvs.map { case (k, v) =>
          k.split(":", 2)(1) -> convertInputValue(v)
        }.toMap
      }
    }

  /** `get_combinations`: cartesian product of named value lists → query
    * dicts (`utils/helpers.py:204-233`).
    */
  def getCombinations(keys: Seq[String], lists: Seq[Seq[Value]]): Seq[Map[String, Value]] = {
    require(keys.length == lists.length,
      "Length of header have to be the same of number of lists")
    lists.foldLeft(Seq(Seq.empty[Value])) { (acc, list) =>
      for (prefix <- acc; v <- list) yield prefix :+ v
    }.map(combo => keys.zip(combo).toMap)
  }

  /** `#`-headed `;`-delimited query/status file → DataFrame
    * (`status_resolver.py:30-40,115-170` / the `queries` file format):
    * first line `#a;b;c` names columns; every row becomes string-typed
    * columns (values keep their raw text — downstream code applies
    * [[convertInputValue]]).
    */
  def readQueryFile(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      .asScala.toSeq.filter(_.trim.nonEmpty)
    require(lines.nonEmpty && lines.head.startsWith("#"),
      s"query file $path must start with a #-header")
    // delimiter auto-detect from the header: prepare-query can write with a
    // custom -d, and splitting a ','-delimited file on ';' would silently
    // yield a single garbage column that passes the length check
    val headerLine = lines.head.drop(1)
    val delim = Seq(";", ",", "\t").find(headerLine.contains).getOrElse(";")
    val splitRe = java.util.regex.Pattern.quote(delim)
    val header = headerLine.split(splitRe, -1).map(_.trim)
    val rows = lines.tail.map { l =>
      val vals = l.split(splitRe, -1).map(_.trim)
      require(vals.length == header.length,
        s"Number of header params and values have to be the same. Got $l")
      org.apache.spark.sql.Row(vals: _*)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      org.apache.spark.sql.types.StructType(header.map(h =>
        org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType))))
  }

  /** Cross-database name → query-identifier parsers
    * (`ogleIII.py:341-350` `_parseDbNames`): MACHO "f.t.s" and OGLE-II
    * "FIELD_PART_ID" naming conventions.
    */
  def parseDbName(db: String, name: String): Map[String, String] = db match {
    case "Macho" =>
      name.split("\\.") match {
        case Array(f, t, s) => Map("Field" -> f, "Tile" -> t, "Seqn" -> s)
        case _              => Map.empty
      }
    case "OgleII" =>
      name.split("_") match {
        case Array(a, b, id) => Map("field" -> s"${a}_$b", "starid" -> id)
        case _               => Map.empty
      }
    case _ => Map.empty
  }

  /** Kepler range value syntax "a..b" (`kepler.py:129-137`) → a Between
    * condition; plain values stay equality.
    */
  def parseKeplerValue(column: String, value: String): QueryCompiler.Condition =
    value.split("\\.\\.") match {
      case Array(lo, hi) if lo.toDoubleOption.isDefined && hi.toDoubleOption.isDefined =>
        QueryCompiler.Between(column, lo.toDouble, hi.toDouble)
      case _ => QueryCompiler.Eq(column, value)
    }

  /** Cross-database crossmatch dedup (SURVEY §2.3; `star.py:107-119`
    * `Star.__eq__`): stars within EPS≈0.5 arcsec or sharing an ident are
    * the same physical object — distance-threshold self-join keeping the
    * lower starId as canonical.
    */
  def crossmatchDedup(stars: DataFrame, epsDeg: Double = 0.000138): DataFrame = {
    import org.apache.spark.sql.functions._
    val a = stars.select(col("starId").as("a_id"), col("coo.ra").as("a_ra"),
      col("coo.dec").as("a_dec"))
    val b = stars.select(col("starId").as("b_id"), col("coo.ra").as("b_ra"),
      col("coo.dec").as("b_dec"))
    // box join on eps-sized cells would be the scale path; at fixture sizes a
    // conditioned join suffices and Catalyst picks BNLJ on the tiny side
    val coordDups = a.join(b,
      col("a_id") < col("b_id") &&
        abs(col("a_ra") - col("b_ra")) < epsDeg &&
        abs(col("a_dec") - col("b_dec")) < epsDeg)
      .select(col("b_id").as("starId"))
    // ident-sharing criterion (`star.py:115-118`): same db key carrying the
    // same name is the same star even when coordinates differ between
    // catalogs (or are null). Equi-join on (db, name) — one shuffle, no
    // all-pairs.
    val idents = stars.select(col("starId"),
      explode(col("identNames")).as(Seq("db", "nm")))
    val identDups = idents.select(col("starId").as("a_id"), col("db"), col("nm"))
      .join(idents.select(col("starId").as("b_id"), col("db"), col("nm")),
        Seq("db", "nm"))
      .filter(col("a_id") < col("b_id"))
      .select(col("b_id").as("starId"))
    val dups = coordDups.unionByName(identDups).distinct()
    stars.join(dups, Seq("starId"), "left_anti")
  }
}
