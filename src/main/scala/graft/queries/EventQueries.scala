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
    ),
    QueryDef(
      "events_funnel",
      (s, dir) => {
        // Ordered funnel signup → click → purchase per user: each stage's
        // first timestamp must follow the previous stage's. Three
        // aggregate passes over the (already small) per-user extremes —
        // every join keys on user_id, so the whole funnel shuffles on one
        // key and broadcast-joins the shrinking stage tables.
        val e = Tables.events(s, dir).select("user_id", "event_type", "ts")
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("signup_ts"))
        val s2 = e.filter(col("event_type") === "click")
          .join(broadcast(s1), "user_id")
          .filter(col("ts") >= col("signup_ts"))
          .groupBy("user_id").agg(min("ts").as("click_ts"))
        val s3 = e.filter(col("event_type") === "purchase")
          .join(broadcast(s2), "user_id")
          .filter(col("ts") >= col("click_ts"))
          .groupBy("user_id").agg(min("ts").as("purchase_ts"))
        val counts = Seq(("1_signup", s1), ("2_click_after_signup", s2),
          ("3_purchase_after_click", s3)).map { case (stage, df) =>
          df.agg(count(lit(1)).as("n_users")).select(lit(stage).as("stage"), col("n_users"))
        }
        counts.reduce(_ unionByName _).orderBy("stage")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts
          FROM events),
        s1 AS (SELECT user_id, min(ts) AS signup_ts FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS click_ts
               FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'click' AND e.ts >= s1.signup_ts
               GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS purchase_ts
               FROM e JOIN s2 USING (user_id)
               WHERE event_type = 'purchase' AND e.ts >= s2.click_ts
               GROUP BY e.user_id)
        SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
        UNION ALL SELECT '2_click_after_signup', count(*) FROM s2
        UNION ALL SELECT '3_purchase_after_click', count(*) FROM s3
        ORDER BY stage""")
    ),
    QueryDef(
      "retention_cohort",
      (s, dir) => {
        // Cohort retention at DAY granularity (the corpus spans 30 days):
        // users grouped by first-activity day, counted as active N days
        // later. Day numbers are exact integer arithmetic, so the matrix
        // is engine-stable.
        val e = Tables.events(s, dir)
          .select(col("user_id"),
            datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("d"))
        val first = e.groupBy("user_id").agg(min("d").as("cohort_day"))
        e.join(broadcast(first), "user_id")
          .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("day_index"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("cohort_day", "day_index")
      },
      Some("""
        WITH e AS (
          SELECT user_id,
                 datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
          FROM events),
        f AS (SELECT user_id, min(d) AS cohort_day FROM e GROUP BY user_id)
        SELECT cohort_day, d - cohort_day AS day_index,
               count(DISTINCT user_id) AS n_active
        FROM e JOIN f USING (user_id)
        GROUP BY cohort_day, day_index
        ORDER BY cohort_day, day_index""")
    )
  )
}
