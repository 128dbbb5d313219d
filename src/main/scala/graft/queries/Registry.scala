package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a DataFrame program over the testdata tables
  * plus (when SQL-expressible) an equivalent DuckDB oracle query. The driver
  * hash-compares both at sf0.01 — column names/types must line up exactly.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Aggregates every query provider into the SparkEntry contract maps. */
object Registry {
  def all: Seq[QueryDef] =
    RelationalQueries.entries ++ LlmQueries.entries ++ BikeShapeQueries.entries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
