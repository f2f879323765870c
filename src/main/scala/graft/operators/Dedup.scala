package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

object Dedup {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracleSql: Map[String, String] = Map()
}
