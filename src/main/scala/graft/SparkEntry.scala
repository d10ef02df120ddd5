package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; SQL-expressible ones carry a DuckDB oracle in [[oracleSql]]
  * with identical column aliases and a total ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape through the pipeline algebra) on
    * sf=0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.queriesMap

  /** DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query. */
  def oracleSql: Map[String, String] = Catalog.oracleMap
}
