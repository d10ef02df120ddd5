package graft.queries

import org.apache.spark.sql.functions._

/** Date/time and JSON operators over `orders` / `events`. */
object EventQueries {

  def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "date_funcs",
      (s, dir) =>
        s.read.parquet(s"$dir/orders.parquet")
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("o_year"),
            month(col("o_orderdate")).as("o_month"),
            dayofmonth(col("o_orderdate")).as("o_day"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
              .as("days_since_95")
          )
          .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
               year(o_orderdate) AS o_year,
               month(o_orderdate) AS o_month,
               day(o_orderdate) AS o_day,
               date_trunc('month', o_orderdate) AS month_start,
               datediff('day', DATE '1995-01-01', o_orderdate) AS days_since_95
        FROM orders ORDER BY o_orderkey""")
    ),
    QueryDef(
      "json_funcs",
      (s, dir) =>
        Tables.events(s, dir)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k_val")
          )
          .orderBy("event_id"),
      Some("""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        FROM events ORDER BY event_id""")
    ),
    QueryDef(
      "date_agg_monthly",
      // Calendar-bucketed aggregation — the batch shape of a tumbling window.
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(
            date_trunc("day", col("ts")).as("day"),
            col("event_type")
          )
          .agg(count(lit(1)).as("n"), Tables.moneySum(col("value")).as("total"))
          .orderBy("day", "event_type"),
      Some("""
        SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
               floor((sum(CAST(floor((value) * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total
        FROM events GROUP BY 1, 2 ORDER BY day, event_type""")
    )
  )
}
