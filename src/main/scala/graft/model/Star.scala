package graft.model

import org.apache.spark.sql.types._

/** The engine's star row (SURVEY §1.1): one fixed StructType with MapType
  * escape hatches for the reference's open-schema `ident`/`more` dicts
  * (`lcc/entities/star.py:10-105`), light curves as bounded in-row arrays
  * (`light_curve.py:10-109` — curves are 10²–10⁵ points, so a row stays
  * well under Tungsten page limits and the parallel axis is stars).
  */
final case class LightCurveData(
    time: Array[Double],
    mag: Array[Double],
    err: Array[Double],
    meta: Map[String, String])

final case class Coordinates(ra: Double, dec: Double)

final case class Star(
    starId: String,                       // canonical name (Star.getIdentName)
    coo: Option[Coordinates],
    identNames: Map[String, String],      // db → name-in-db
    identIds: Map[String, String],        // "db:key" → query-identifier value
    more: Map[String, String],            // open-schema properties
    starClass: Option[String],
    lightCurves: Seq[LightCurveData]) {

  /** First light curve, like the reference's `star.lightCurve`. */
  def lightCurve: Option[LightCurveData] = lightCurves.headOption
}

object Star {
  val lcSchema: StructType = StructType(Seq(
    StructField("time", ArrayType(DoubleType, containsNull = false)),
    StructField("mag", ArrayType(DoubleType, containsNull = false)),
    StructField("err", ArrayType(DoubleType, containsNull = false)),
    StructField("meta", MapType(StringType, StringType))))

  val schema: StructType = StructType(Seq(
    StructField("starId", StringType, nullable = false),
    StructField("coo", StructType(Seq(
      StructField("ra", DoubleType), StructField("dec", DoubleType))), nullable = true),
    StructField("identNames", MapType(StringType, StringType)),
    StructField("identIds", MapType(StringType, StringType)),
    StructField("more", MapType(StringType, StringType)),
    StructField("starClass", StringType, nullable = true),
    StructField("lightCurves", ArrayType(lcSchema))))
}
