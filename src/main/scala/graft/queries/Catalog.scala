package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark implementation over a dataset directory plus
  * (when SQL-expressible) an equivalent ANSI SQL string the driver runs in
  * DuckDB over the same parquet files. Column names/order of rows must be
  * deterministic and identical on both sides — every aggregate is aliased
  * the same way and every query ends in a total ORDER BY.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Catalog {
  /** All registered queries across the operator modules. */
  def all: Seq[QueryDef] =
    Relational.queries ++ AnalyticsQueries.queries ++ WarehouseQueries.queries ++ StatQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ EventQueries.queries ++
      PipelineQueries.queries ++ UdfQueries.queries ++
      TypedQueries.queries ++ StreamingQueries.queries ++ OpsQueries.queries

  def queriesMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
