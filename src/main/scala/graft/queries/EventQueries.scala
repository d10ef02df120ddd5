package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.SparkOps.Materialize

/** Date/time and JSON operators over `orders` / `events`, plus the
  * time-series shapes built on them: calendar gap filling, SCD-2 interval
  * histories, and exact-arithmetic outlier detection.
  */
object EventQueries {

  def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "date_funcs",
      (s, dir) =>
        Tables.read(s, dir, "orders")
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
      "gap_fill_interpolate",
      // Linear interpolation over the calendar spine: the sparse daily
      // mean (one event type for one user, so gaps actually exist — 10
      // observed days over a ~29-day span) joins the full day
      // spine; missing days take prev + (next − prev)·frac between their
      // bracketing observed days, boundary gaps clamp to the nearest
      // observation. Neighbor lookup is two windows over the SPINE
      // (last/first ignoreNulls) — tiny, day-grain — never a self-join;
      // the math runs on exact cent quanta cast to double with identical
      // IEEE op order in the oracle, rounded to cents at the end.
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("event_type") === "error" && col("user_id") === 3)
        val daily = e.groupBy(to_date(col("ts")).as("d"))
          .agg((sum(floor(col("value") * 10000 + 0.5).cast("long"))
            .cast("double") / 10000.0 / count(lit(1))).as("v"))
        val days = e
          .agg(min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("d"))
        val w = Window.orderBy(col("d"))
        val before = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val after = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val joined = days.join(daily, Seq("d"), "left")
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(before))
          .withColumn("pd", last(when(col("v").isNotNull, col("d")), ignoreNulls = true)
            .over(before))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(after))
          .withColumn("nd", first(when(col("v").isNotNull, col("d")), ignoreNulls = true)
            .over(after))
        joined.select(col("d"),
          (floor(when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (datediff(col("d"), col("pd")).cast("double") /
                datediff(col("nd"), col("pd")).cast("double"))) * 100 + 0.5) / 100)
            .as("value"),
          when(col("v").isNotNull, lit("observed"))
            .when(col("pv").isNull || col("nv").isNull, lit("edge"))
            .otherwise(lit("interpolated")).as("src"))
          .orderBy("d")
      },
      Some("""
        WITH e AS (
          SELECT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS d, value
          FROM events WHERE event_type = 'error' AND user_id = 3),
        daily AS (
          SELECT d,
                 CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 / count(*) AS v
          FROM e GROUP BY d),
        b AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
        days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM b),
        sp AS (
          SELECT days.d, daily.v,
                 last_value(daily.v IGNORE NULLS) OVER (ORDER BY days.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 last_value(CASE WHEN daily.v IS NOT NULL THEN days.d END IGNORE NULLS)
                   OVER (ORDER BY days.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                 first_value(daily.v IGNORE NULLS) OVER (ORDER BY days.d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 first_value(CASE WHEN daily.v IS NOT NULL THEN days.d END IGNORE NULLS)
                   OVER (ORDER BY days.d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
          FROM days LEFT JOIN daily USING (d))
        SELECT d,
               floor((CASE WHEN v IS NOT NULL THEN v
                           WHEN pv IS NULL THEN nv
                           WHEN nv IS NULL THEN pv
                           ELSE pv + (nv - pv) *
                             (CAST(d - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
                      END) * 100 + 0.5) / 100 AS value,
               CASE WHEN v IS NOT NULL THEN 'observed'
                    WHEN pv IS NULL OR nv IS NULL THEN 'edge'
                    ELSE 'interpolated' END AS src
        FROM sp ORDER BY d""")
    ),
    QueryDef(
      "gap_fill",
      // Time-series gap filling: the calendar spine is generated
      // DISTRIBUTED (sequence() over the min/max bounds — a one-row
      // broadcast, then explode), never a driver-side loop; sparse daily
      // aggregates left-join onto it. The 100 TB shape: bounds come from
      // partition-pruned min/max statistics, the spine is tiny, the join
      // broadcasts the spine against the aggregated (already small) side.
      (s, dir) => {
        val orders = Tables.read(s, dir, "orders")
        val daily = orders
          .groupBy(to_date(col("o_orderdate")).as("d"))
          .agg(count(lit(1)).as("n"),
            Tables.moneySum(col("o_totalprice")).as("total"))
        val days = orders
          .agg(min(to_date(col("o_orderdate"))).as("lo"),
            max(to_date(col("o_orderdate"))).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("d"))
        days.join(daily, Seq("d"), "left")
          .select(col("d"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("total"), lit(0.0)).as("total"))
          .orderBy("d")
      },
      Some("""
        WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                          max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
        days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d FROM b),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n,
                 floor((sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total
          FROM orders GROUP BY 1)
        SELECT days.d, coalesce(daily.n, 0) AS n, coalesce(daily.total, 0.0) AS total
        FROM days LEFT JOIN daily USING (d) ORDER BY d""")
    ),
    QueryDef(
      "scd2_history",
      // Slowly-changing-dimension type 2 from an ordered change log: each
      // order opens a validity interval closed by the customer's next
      // order (lead() over one window). One shuffle on the entity key;
      // the (o_orderdate, o_orderkey) compound sort key makes same-day
      // rows a total order, so intervals are engine-stable.
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.read(s, dir, "orders")
          .select(col("o_custkey"),
            row_number().over(w).as("version"),
            col("o_orderkey"), col("o_orderpriority"),
            col("o_orderdate").as("valid_from"),
            lead(col("o_orderdate"), 1).over(w).as("valid_to"))
          .orderBy("o_custkey", "version")
      },
      Some("""
        SELECT o_custkey,
               CAST(row_number() OVER w AS INTEGER) AS version,
               o_orderkey, o_orderpriority, o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, version""")
    ),
    QueryDef(
      "window_ewma",
      // Bounded exponentially-weighted moving average per user (α = 1/2
      // over the last ≤10 observations). α = 1/2 makes every weight a
      // power of two, so the whole computation is EXACT integer
      // arithmetic over cent-quanta values — num = Σ xᵢ·2^(10−n+i),
      // den = Σ 2^(10−n+i), ewma = (num + den>>1) div den — and no float
      // ever enters; both engines produce identical longs (values are
      // non-negative, so floor and truncating division agree). The frame
      // is a plain 9-PRECEDING window over one user_id shuffle.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(-9, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"),
            floor(col("value") * 10000 + 0.5).cast("long").as("v"))
          .withColumn("vals", collect_list(col("v")).over(w))
          .withColumn("n", size(col("vals")))
          .withColumn("num", expr(
            "aggregate(sequence(0, n - 1), 0L, (acc, i) -> acc + element_at(vals, i + 1) * shiftleft(1L, 10 - n + i))"))
          .withColumn("den", expr(
            "aggregate(sequence(0, n - 1), 0L, (acc, i) -> acc + shiftleft(1L, 10 - n + i))"))
          .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
            col("event_id"),
            (expr("(num + shiftright(den, 1)) div den") / 10000.0).as("ewma"))
          .orderBy("user_id", "ts", "event_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
          FROM events),
        fr AS (
          SELECT user_id, ts_us, event_id,
                 list(v) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vals
          FROM e),
        sc AS (
          SELECT user_id, ts_us, event_id,
                 list_sum(list_transform(range(1, len(vals) + 1),
                   i -> vals[i] * (1::BIGINT << (10 - len(vals) + i - 1)))) AS num,
                 list_sum(list_transform(range(1, len(vals) + 1),
                   i -> (1::BIGINT << (10 - len(vals) + i - 1)))) AS den
          FROM fr)
        SELECT user_id, make_timestamp(ts_us) AS ts, event_id,
               ((num + (den >> 1)) // den) / 10000.0 AS ewma
        FROM sc
        ORDER BY user_id, ts, event_id""")
    ),
    QueryDef(
      "join_point_in_time",
      // The CONSUMPTION side of SCD-2: enrich each lineitem with the
      // customer attribute that was effective AT ITS SHIP DATE (not at
      // order time — late-shipping lines see newer versions). Realized as
      // the as-of argmax shape: fact ⋈ dim-versions on the customer key
      // (expansion bounded by versions-per-customer), keep the latest
      // valid_from ≤ ship date via one associative max(struct) — no
      // interval banding, no window over the fact table. The struct's
      // (valid_from, version) prefix is unique per customer, so the
      // argmax is total and engine-stable. The synthetic lineitem table
      // has duplicate (orderkey, linenumber) pairs, so fact lines
      // pre-aggregate to (composite, multiplicity) and the final rollup
      // weights by multiplicity — line identity never depends on a
      // nondeterministic row id.
      (s, dir) => {
        // Round-15 shape change (same result, oracle unchanged): the
        // fact ⋈ dim-versions inequality join expanded every fact grain
        // row by its customer's FULL eligible version history (~9M rows
        // at sf0.1) and resolved the argmax with a non-hashable
        // SortAggregate pair. The as-of join is instead ONE running
        // last(ignoreNulls) window over the UNIONED (dim ∪ fact) stream
        // per customer — the join_asof_nearest / events_attribution
        // shape: rows sort by (date, dim-before-fact, orderkey), so at a
        // fact row the last dim value seen IS the max-(valid_from,
        // version) version with valid_from ≤ shipdate (version was
        // row_number over (o_orderdate, o_orderkey), so (valid_from,
        // version) order ≡ (o_orderdate, o_orderkey) order). No
        // expansion at any skew: a whale customer costs one linear sort
        // partition, never lines × versions rows. Inner-join semantics
        // kept by dropping fact rows with no preceding version.
        val dimRows = Tables.read(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            col("o_orderdate").as("d"),
            lit(0).as("is_fact"),
            col("o_orderkey").cast("long").as("tie"),
            col("o_orderpriority").as("eff"),
            lit(null).cast("long").as("rev_q"),
            lit(null).cast("long").as("mult"))
        val fact = Tables.read(s, dir, "lineitem")
          .join(Tables.read(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_custkey"), col("l_shipdate"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + 0.5)
              .cast("long").as("rev_q"))
          .agg(count(lit(1)).as("mult"))
        val factRows = fact
          .select(col("o_custkey").as("ck"),
            col("l_shipdate").as("d"),
            lit(1).as("is_fact"),
            lit(0L).as("tie"),
            lit(null).cast("string").as("eff"),
            col("rev_q"), col("mult"))
        val w = Window.partitionBy(col("ck"))
          .orderBy(col("d"), col("is_fact"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // The running last() carries the dim marker SEPARATELY from the
        // payload (a one-field struct): a dim version whose payload is
        // NULL still registers as "a version was seen", instead of
        // falling back to an older version's payload (ADVICE r15 — the
        // TPC-H column is never null, so results are unchanged here, but
        // the as-of contract is now right for nullable payloads).
        dimRows.unionByName(factRows)
          .withColumn("eff_v",
            last(when(col("is_fact") === 0, struct(col("eff"))),
              ignoreNulls = true).over(w))
          .filter(col("is_fact") === 1 && col("eff_v").isNotNull)
          .withColumn("effective_priority", col("eff_v").getField("eff"))
          .groupBy(col("effective_priority"))
          .agg(sum(col("mult")).as("n_lines"),
            (floor((sum(col("rev_q") * col("mult")) + 50) / 100) / 100.0).as("revenue"))
          .orderBy("effective_priority")
      },
      Some("""
        WITH dim AS (
          SELECT o_custkey AS d_custkey,
                 CAST(row_number() OVER w AS INTEGER) AS version,
                 o_orderdate AS valid_from, o_orderpriority AS eff_priority
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        fact AS (
          SELECT l.l_orderkey, o.o_custkey, l.l_shipdate,
                 CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT) AS rev_q,
                 count(*) AS mult
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2, 3, 4),
        pit AS (
          SELECT f.rev_q, f.mult, d.eff_priority,
                 row_number() OVER (PARTITION BY f.l_orderkey, f.o_custkey,
                     f.l_shipdate, f.rev_q, f.mult
                   ORDER BY d.valid_from DESC, d.version DESC) AS rn
          FROM fact f JOIN dim d
            ON f.o_custkey = d.d_custkey AND d.valid_from <= f.l_shipdate)
        SELECT eff_priority AS effective_priority,
               CAST(sum(mult) AS BIGINT) AS n_lines,
               floor((sum(rev_q * mult) + 50) / 100) / 100.0 AS revenue
        FROM pit WHERE rn = 1
        GROUP BY effective_priority
        ORDER BY effective_priority""")
    ),
    QueryDef(
      "anomaly_zscore",
      // Per-type z-score outlier counts with an EXACT integer decision:
      // |v−μ| > 2.5σ  ⇔  4·(n·v−S)² > 25·(n·Q−S²)  over long-quantized
      // values (S=Σv, Q=Σv²), evaluated in decimal(38,0) — no float enters
      // the predicate, so a borderline row can never flip between engines
      // (DuckDB mirrors it in HUGEINT). Two passes over events: one tiny
      // grouped aggregate, broadcast back for the filter. Headroom:
      // |n·v| < 1e12 at sf1 → squares < 1e24 ≪ 1e38.
      (s, dir) => {
        val dec = "decimal(38,0)"
        val q = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 10000 + 0.5).cast("long").as("v_e4"))
        val st = q.groupBy("event_type").agg(
          count(lit(1)).cast(dec).as("n_t"),
          sum(col("v_e4").cast(dec)).as("s_t"),
          sum(col("v_e4").cast(dec) * col("v_e4").cast(dec)).as("q_t"))
        val dev = col("n_t") * col("v_e4").cast(dec) - col("s_t")
        q.join(broadcast(st), "event_type")
          .where(dev * dev * lit(4) > (col("n_t") * col("q_t") - col("s_t") * col("s_t")) * lit(25))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_outliers"), min(col("event_id")).as("first_outlier"))
          .orderBy("event_type")
      },
      Some("""
        WITH q AS (
          SELECT event_id, event_type,
                 CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v_e4
          FROM events),
        st AS (
          SELECT event_type, CAST(count(*) AS HUGEINT) AS n_t,
                 sum(CAST(v_e4 AS HUGEINT)) AS s_t,
                 sum(CAST(v_e4 AS HUGEINT) * v_e4) AS q_t
          FROM q GROUP BY event_type)
        SELECT q.event_type, count(*) AS n_outliers,
               min(q.event_id) AS first_outlier
        FROM q JOIN st USING (event_type)
        WHERE (st.n_t * q.v_e4 - st.s_t) * (st.n_t * q.v_e4 - st.s_t) * 4
              > (st.n_t * st.q_t - st.s_t * st.s_t) * 25
        GROUP BY q.event_type ORDER BY q.event_type""")
    ),
    QueryDef(
      "window_forward_fill",
      // Forward fill (carry last observation forward): last(col,
      // ignoreNulls) over a running frame — the partner primitive to
      // gap_fill for sparse time series. One shuffle on the entity key;
      // the (date, orderkey) compound sort makes the carried value
      // deterministic under same-day ties. Nulls are derived (every
      // '5-LOW' hidden) so the fill path is actually exercised.
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.read(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            nullif(col("o_orderpriority"), lit("5-LOW")).as("v"))
          .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
          .drop("o_orderdate")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               nullif(o_orderpriority, '5-LOW') AS v,
               last_value(nullif(o_orderpriority, '5-LOW') IGNORE NULLS) OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        FROM orders ORDER BY o_custkey, o_orderkey""")
    ),
    QueryDef(
      "agg_histogram",
      // Fixed-width value histogram (10 bins between the observed global
      // min/max) with INTEGER bin assignment over quantized values — a
      // float `(v-lo)/width` would put edge values in different bins per
      // engine; `((v-lo)·10) div span` cannot. Bounds ride along as a
      // broadcast one-row plan; the bin groupBy partial-aggregates
      // map-side.
      (s, dir) => {
        val q = Tables.events(s, dir).select(col("event_type"),
          floor(col("value") * 10000 + 0.5).cast("long").as("v"))
        val b = q.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
        q.crossJoin(broadcast(b))
          .select(col("event_type"),
            expr("((v - lo) * 10) div (hi - lo + 1)").as("bin"))
          .groupBy("event_type", "bin")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "bin")
      },
      Some("""
        WITH q AS (SELECT event_type,
                     CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v FROM events),
        b AS (SELECT min(v) AS lo, max(v) AS hi FROM q)
        SELECT event_type, ((v - lo) * 10) // (hi - lo + 1) AS bin, count(*) AS n
        FROM q, b GROUP BY 1, 2 ORDER BY event_type, bin""")
    ),
    QueryDef(
      "window_cume_distinct",
      // Cumulative DISTINCT users per day — COUNT(DISTINCT) OVER is
      // unsupported as a window in Spark, and the naive emulation
      // (size(collect_set) over an unbounded frame) holds every key in
      // window state. The scalable identity: a user is DISTINCT exactly
      // once, on their first day — so aggregate first-appearances per day
      // (shuffle on (type, user), then (type, day) — both partial-agg
      // friendly) and run a plain cumulative SUM over the small daily
      // series.
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_type"), col("user_id"), to_date(col("ts")).as("d"))
        val first = e.groupBy("event_type", "user_id").agg(min("d").as("d"))
        first.groupBy("event_type", "d").agg(count(lit(1)).as("n_new"))
          .withColumn("cume_users",
            sum(col("n_new")).over(
              Window.partitionBy("event_type").orderBy("d")))
          .orderBy("event_type", "d")
      },
      Some("""
        WITH e AS (SELECT event_type, user_id, CAST(ts AS DATE) AS d FROM events),
        f AS (SELECT event_type, user_id, min(d) AS d FROM e GROUP BY 1, 2),
        p AS (SELECT event_type, d, count(*) AS n_new FROM f GROUP BY 1, 2)
        SELECT event_type, d, n_new,
               CAST(sum(n_new) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS cume_users
        FROM p ORDER BY event_type, d""")
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
    ),
    QueryDef(
      "events_transitions",
      // First-order Markov transition counts over per-user event sequences
      // (the "what happens after X" matrix behind session modeling and
      // next-event prediction). One shuffle on user_id builds the ordered
      // sequences; the bigram groupBy partial-aggregates map-side onto a
      // |types|² matrix — constant size no matter how many events flow in.
      // Probabilities quantized to 1e-4 (identical IEEE mul/floor per row).
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p",
            floor(col("n").cast("double") /
              sum(col("n")).over(Window.partitionBy(col("from_type")))
              * 10000 + 0.5) / 10000)
          .orderBy("from_type", "to_type")
      },
      Some("""
        WITH t AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          FROM events),
        c AS (
          SELECT from_type, to_type, count(*) AS n
          FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               floor(CAST(n AS DOUBLE) /
                 CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT)
                 * 10000 + 0.5) / 10000 AS p
        FROM c ORDER BY from_type, to_type""")
    ),
    QueryDef(
      "events_ohlc",
      // Daily open/high/low/close candles per event type. Open/close via
      // the associative argmin/argmax struct trick — min(struct(ts, id,
      // value)) — so the whole candle is ONE map-side-combinable aggregate
      // pass: no window sort, no per-partition ordering requirement.
      // event_id breaks same-timestamp ties; values pass through with no
      // arithmetic, so the doubles are bit-exact across engines.
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(
            min(struct(col("ts"), col("event_id"), col("value")))
              .getField("value").as("open"),
            max(struct(col("ts"), col("event_id"), col("value")))
              .getField("value").as("close"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            count(lit(1)).as("n"))
          .orderBy("day", "event_type"),
      Some("""
        WITH b AS (
          SELECT date_trunc('day', ts) AS day, event_type, value,
                 first_value(value) OVER (
                   PARTITION BY date_trunc('day', ts), event_type
                   ORDER BY ts, event_id) AS open,
                 last_value(value) OVER (
                   PARTITION BY date_trunc('day', ts), event_type
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS close
          FROM events)
        SELECT day, event_type, min(open) AS open, min(close) AS close,
               max(value) AS high, min(value) AS low, count(*) AS n
        FROM b GROUP BY day, event_type ORDER BY day, event_type""")
    ),
    QueryDef(
      "join_interval_overlap",
      // TWO-SIDED interval-overlap join — the operator family join_range
      // (|a−b| ≤ w point-banding) does not cover: cross-user pairs of
      // CONCURRENT SESSIONS (a.lo < b.hi AND b.lo < a.hi), counted per
      // day of overlap start. Intervals are the 30-min-gap sessions of
      // sessionize_batch (same derivation, one user_id shuffle shared by
      // both window passes); a per-(user, day) min/max interval would
      // degenerate on this corpus — every user spans every day, making
      // the measure all-pairs (17M rows at sf0.1), where session
      // intervals are short and yield 151k genuine concurrency pairs.
      // Scale shape: each interval EXPLODES to the hour buckets it spans
      // (sessions are short — fan-out is 1-2 buckets), candidates come
      // from an equi-join on the bucket — LOSSLESS, because two
      // overlapping intervals both contain the hour bucket of
      // max(lo_a, lo_b) — and the exact overlap predicate plus a
      // session-pair distinct remove band duplicates. No cartesian, no
      // broadcast nested loop; at any corpus size the join shuffles on
      // (bucket) only. The session-pair identity key is
      // (u_a, lo_a, u_b, lo_b): a user's sessions are time-disjoint and
      // nonempty, so session start is unique within a user.
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        val iv = Tables.events(s, dir)
          .select(col("user_id"), col("ts"))
          .withColumn("new_session",
            when(col("ts") < lag(col("ts"), 1).over(byUser) + expr("INTERVAL 30 MINUTES"), 0)
              .otherwise(1))
          .withColumn("sid", sum(col("new_session"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
          // Both join sides read the interval table; materialize it once
          // or the whole sessionize pipeline (events scan + user_id
          // window + per-session aggregate) executes twice — the aliased
          // sides diverge before any exchange, so exchange reuse never
          // applies (round-15: measured ~2x the interval-derivation cost
          // in the before plan's duplicated subtree).
          .materialized
        def bucketed(side: String) = iv.select(
          col("user_id").as(s"u_$side"),
          col("lo").as(s"lo_$side"), col("hi").as(s"hi_$side"),
          explode(sequence(
            floor(unix_timestamp(col("lo")) / 3600).cast("long"),
            floor(unix_timestamp(col("hi")) / 3600).cast("long"))).as(s"bkt_$side"))
        bucketed("a").join(bucketed("b"),
            col("bkt_a") === col("bkt_b") && col("u_a") < col("u_b") &&
              col("lo_a") < col("hi_b") && col("lo_b") < col("hi_a"))
          .select(to_date(greatest(col("lo_a"), col("lo_b"))).as("day"),
            col("u_a"), col("lo_a"), col("u_b"), col("lo_b"))
          .distinct()
          .groupBy("day").agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("n_pairs").desc, col("day"))
          .limit(20)
      },
      Some("""
        WITH e AS (
          SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events),
        marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        sessions AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked),
        iv AS (
          SELECT user_id, min(ts) AS lo, max(ts) AS hi
          FROM sessions GROUP BY user_id, sid),
        p AS (
          SELECT CAST(greatest(a.lo, b.lo) AS DATE) AS day
          FROM iv a JOIN iv b
            ON a.user_id < b.user_id AND a.lo < b.hi AND b.lo < a.hi)
        SELECT day, count(*) AS n_pairs FROM p GROUP BY day
        ORDER BY n_pairs DESC, day LIMIT 20""")
    ),
    QueryDef(
      "events_active_users",
      // Rolling 7-day distinct actives (WAU) next to the daily count
      // (DAU). COUNT(DISTINCT) OVER a RANGE frame isn't natively
      // expressible, and carrying per-day user sets in window state is
      // unbounded; the scale shape instead collapses to distinct
      // (day, user_id) FIRST — the only corpus-sized shuffle — then
      // EXPLODES each user-day to the ≤ 7 window-end days it covers
      // (active on day ⇒ counted in every window ending day..day+6):
      // pure map-side fan-out, equi-joined against the broadcast day
      // spine to keep only observed days. A BETWEEN band join would
      // plan a nested loop costing |days| comparisons per user-day;
      // this shape is a hash join at any corpus size, expansion
      // bounded at 7×.
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct()
        val days = ud.select(col("day").as("d")).distinct()
        val wau = ud
          .select(col("user_id"),
            explode(sequence(col("day"), date_add(col("day"), 6))).as("d"))
          .join(broadcast(days), "d")
          .groupBy("d").agg(countDistinct(col("user_id")).as("wau"))
        val dau = ud.groupBy(col("day").as("d")).agg(count(lit(1)).as("dau"))
        dau.join(wau, "d")
          .select(col("d").as("day"), col("dau"), col("wau"))
          .orderBy("day")
      },
      Some("""
        WITH ud AS (
          SELECT DISTINCT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
                 user_id
          FROM events),
        days AS (SELECT DISTINCT day AS d FROM ud),
        wau AS (
          SELECT d, count(DISTINCT user_id) AS wau
          FROM ud JOIN days ON ud.day BETWEEN d - 6 AND d
          GROUP BY d),
        dau AS (SELECT day AS d, count(*) AS dau FROM ud GROUP BY day)
        SELECT d AS day, dau, wau FROM dau JOIN wau USING (d) ORDER BY day""")
    ),
    QueryDef(
      "events_streaks",
      // Longest consecutive-day activity streak per user — gaps-and-
      // islands on the DAY grain (sessionize_batch islands on raw-ts
      // gaps). day − row_number(day) is constant exactly along a run of
      // consecutive days, so one user_id shuffle + one bounded per-user
      // window turn runs into groupable island keys; no self-join, no
      // spine. Distinct-day collapse first keeps the window input at one
      // row per (user, day).
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        ud.withColumn("grp", date_sub(col("day"), row_number().over(w)))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(sum(col("len")).as("n_active_days"),
            count(lit(1)).as("n_streaks"),
            max(col("len")).as("longest_streak"))
          .orderBy("user_id")
      },
      Some("""
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day
          FROM events),
        isl AS (
          SELECT user_id, day,
                 day - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
          FROM ud),
        st AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY user_id, grp)
        SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
               count(*) AS n_streaks, max(len) AS longest_streak
        FROM st GROUP BY user_id ORDER BY user_id""")
    ),
    QueryDef(
      "join_asof_nearest",
      // Nearest-event temporal join: each purchase pairs with the click
      // (same user) minimizing |Δt| — join_asof covers only the backward
      // direction. Plan shape: ONE shuffle on user_id over the union of
      // both event kinds sorted once; the backward candidate is
      // max(struct(us, id)) over a RANGE frame up to the current instant,
      // the forward candidate min(struct) over the trailing frame — never
      // a click×purchase pair blowup, whatever the per-user skew.
      // Same-instant clicks sit in BOTH frames and ties resolve inside
      // the deterministic struct order (backward prefers the larger
      // event_id, forward the smaller); equidistant candidates prefer
      // backward. Purchases with no click at all keep null click_id.
      (s, dir) => {
        val e = Tables.events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val cand = when(col("event_type") === "click",
          struct(col("us"), col("event_id")))
        val byUs = Window.partitionBy(col("user_id")).orderBy(col("us"))
        val enriched = e
          .withColumn("bw",
            max(cand).over(byUs.rangeBetween(Window.unboundedPreceding, 0)))
          .withColumn("fw",
            min(cand).over(byUs.rangeBetween(0, Window.unboundedFollowing)))
          .filter(col("event_type") === "purchase")
        val pickBw = col("bw").isNotNull && (col("fw").isNull ||
          (col("us") - col("bw.us")) <= (col("fw.us") - col("us")))
        enriched.select(
            col("event_id"), col("user_id"),
            when(pickBw, col("bw.event_id")).otherwise(col("fw.event_id"))
              .as("click_id"),
            when(pickBw, col("bw.us") - col("us"))
              .otherwise(col("fw.us") - col("us")).as("delta_us"))
          .orderBy("event_id")
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us
          FROM events WHERE event_type IN ('click', 'purchase')),
        p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
        c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        bw AS (
          SELECT p.event_id AS pid, c.us AS cus, c.event_id AS cid,
                 row_number() OVER (PARTITION BY p.event_id
                   ORDER BY c.us DESC, c.event_id DESC) AS rn
          FROM p JOIN c ON c.user_id = p.user_id AND c.us <= p.us
          QUALIFY rn = 1),
        fw AS (
          SELECT p.event_id AS pid, c.us AS cus, c.event_id AS cid,
                 row_number() OVER (PARTITION BY p.event_id
                   ORDER BY c.us ASC, c.event_id ASC) AS rn
          FROM p JOIN c ON c.user_id = p.user_id AND c.us >= p.us
          QUALIFY rn = 1)
        SELECT p.event_id, p.user_id,
               CASE WHEN bw.pid IS NOT NULL
                     AND (fw.pid IS NULL OR (p.us - bw.cus) <= (fw.cus - p.us))
                    THEN bw.cid ELSE fw.cid END AS click_id,
               CASE WHEN bw.pid IS NOT NULL
                     AND (fw.pid IS NULL OR (p.us - bw.cus) <= (fw.cus - p.us))
                    THEN bw.cus - p.us ELSE fw.cus - p.us END AS delta_us
        FROM p LEFT JOIN bw ON bw.pid = p.event_id
               LEFT JOIN fw ON fw.pid = p.event_id
        ORDER BY p.event_id""")
    ),
    QueryDef(
      "window_time_weighted_avg",
      // Time-weighted average per user (each reading holds until the
      // next — the IoT/finance aggregate plain avg gets wrong under
      // irregular sampling): TWA = Σ qᵢ·Δtᵢ / Σ Δtᵢ over the user's
      // observation span, the last reading carrying no weight. One
      // user_id shuffle serves both the lead() window and the final
      // aggregate (same key — Catalyst reuses the partitioning).
      // Exactness: cent quanta × second-grain gaps keep every product
      // and sum exactly representable in doubles (≤ ~2.6e10 per user
      // here; the 100 TB variant widens num to decimal(38,0)); the only
      // float op is the final division, identical order both engines.
      // Same-instant readings tie-break by event_id — Δt=0 rows carry
      // no weight but decide WHICH value spans to the next instant, so
      // the order must match the oracle exactly.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t_s"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts) div 1000000").as("t_s"),
            floor(col("value") * 100 + 0.5).cast("long").as("q"))
          .withColumn("nxt", lead(col("t_s"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy("user_id")
          .agg(sum(col("q") * (col("nxt") - col("t_s"))).as("num"),
            sum(col("nxt") - col("t_s")).as("den"))
          .filter(col("den") > 0)
          .select(col("user_id"), col("den").as("span_s"),
            round(col("num").cast("double") / col("den").cast("double") / 100.0, 4)
              .as("twa"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS t_s,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS q
          FROM events),
        w AS (
          SELECT user_id, q, t_s,
                 lead(t_s) OVER (PARTITION BY user_id
                   ORDER BY t_s, event_id) AS nxt
          FROM e),
        g AS (
          SELECT user_id,
                 CAST(sum(q * (nxt - t_s)) AS BIGINT) AS num,
                 CAST(sum(nxt - t_s) AS BIGINT) AS den
          FROM w WHERE nxt IS NOT NULL GROUP BY user_id)
        SELECT user_id, den AS span_s,
               round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 100.0, 4) AS twa
        FROM g WHERE den > 0 ORDER BY user_id""")
    ),
    QueryDef(
      "window_rolling_slope",
      // Rolling 30-day linear-regression slope per event type — trend
      // detection as ONE value-based RANGE frame accumulating the five
      // regression sums (n, Σx, Σy, Σxy, Σx²), slope from the closed
      // form (nΣxy − ΣxΣy)/(nΣx² − (Σx)²). Every sum is exact long
      // arithmetic (day index × cent quanta); the single double division
      // happens on identical exact longs in both engines, so round(4) is
      // deterministic. Degenerate one-day windows yield NULL, not a 0/0.
      // One event_type shuffle serves the daily aggregate AND the window.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("q"))
          .withColumn("x", datediff(col("day"), lit("1990-01-01").cast("date")))
        val w = Window.partitionBy(col("event_type")).orderBy(col("x"))
          .rangeBetween(-29, 0)
        val den = col("n") * col("sxx") - col("sx") * col("sx")
        daily.select(col("event_type"), col("day"),
            count(lit(1)).over(w).as("n"),
            sum(col("x").cast("long")).over(w).as("sx"),
            sum(col("q")).over(w).as("sy"),
            sum(col("x") * col("q")).over(w).as("sxy"),
            sum(col("x").cast("long") * col("x")).over(w).as("sxx"))
          .select(col("event_type"), col("day"), col("n"),
            when(den === 0, lit(null))
              .otherwise(round(
                (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                  / den.cast("double") / 100.0, 4)).as("slope"))
          .orderBy("event_type", "day")
      },
      Some("""
        WITH daily AS (
          SELECT event_type,
                 CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS q
          FROM events GROUP BY 1, 2),
        d2 AS (
          SELECT event_type, day, q,
                 datediff('day', DATE '1990-01-01', day) AS x
          FROM daily),
        s AS (
          SELECT event_type, day,
                 count(*) OVER w AS n,
                 CAST(sum(x) OVER w AS BIGINT) AS sx,
                 CAST(sum(q) OVER w AS BIGINT) AS sy,
                 CAST(sum(x * q) OVER w AS BIGINT) AS sxy,
                 CAST(sum(CAST(x AS BIGINT) * x) OVER w AS BIGINT) AS sxx
          FROM d2
          WINDOW w AS (PARTITION BY event_type ORDER BY x
                       RANGE BETWEEN 29 PRECEDING AND CURRENT ROW))
        SELECT event_type, day, n,
               CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                    ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 4)
               END AS slope
        FROM s ORDER BY event_type, day""")
    ),
    QueryDef(
      "events_inter_arrival",
      // Exact p50/p95 inter-arrival gap per event type — the traffic-
      // shape statistic behind capacity planning and bot detection —
      // WITHOUT per-group buffering: gaps come from one lag() pass over
      // per-(user, type) streams, then the positional-selection shape of
      // agg_median_selection picks both order statistics from a single
      // ranked window (p50 at (n+1) div 2, p95 at (95n+99) div 100 =
      // ⌈0.95n⌉ — pure integer positions over a unique total order, no
      // interpolation, engine-exact).
      (s, dir) => {
        val perStream = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val gaps = Tables.events(s, dir)
          .select(col("event_type"), col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("prev", lag(col("us"), 1).over(perStream))
          .filter(col("prev").isNotNull)
          .withColumn("gap_s", expr("(us - prev) div 1000000"))
        val ranked = Window.partitionBy(col("event_type"))
          .orderBy(col("gap_s"), col("user_id"), col("event_id"))
        val whole = Window.partitionBy(col("event_type"))
        gaps.withColumn("rn", row_number().over(ranked))
          .withColumn("n", count(lit(1)).over(whole))
          .filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("(n * 95 + 99) div 100"))
          .groupBy("event_type")
          .agg(max(col("n")).as("n_gaps"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("gap_s")))
              .as("p50_s"),
            max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("gap_s")))
              .as("p95_s"))
          .orderBy("event_type")
      },
      Some("""
        WITH e AS (
          SELECT event_type, user_id, event_id, epoch_ns(ts) // 1000 AS us
          FROM events),
        g AS (
          SELECT event_type, user_id, event_id, us,
                 lag(us) OVER (PARTITION BY user_id, event_type
                   ORDER BY us, event_id) AS prev
          FROM e),
        gaps AS (
          SELECT event_type, user_id, event_id, (us - prev) // 1000000 AS gap_s
          FROM g WHERE prev IS NOT NULL),
        r AS (
          SELECT event_type, gap_s,
                 row_number() OVER (PARTITION BY event_type
                   ORDER BY gap_s, user_id, event_id) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM gaps)
        SELECT event_type, max(n) AS n_gaps,
               max(CASE WHEN rn = (n + 1) // 2 THEN gap_s END) AS p50_s,
               max(CASE WHEN rn = (n * 95 + 99) // 100 THEN gap_s END) AS p95_s
        FROM r WHERE rn = (n + 1) // 2 OR rn = (n * 95 + 99) // 100
        GROUP BY event_type ORDER BY event_type""")
    ),
    QueryDef(
      "events_user_entropy",
      // Behavioral entropy per user — the bot-detection signal:
      // scripted accounts concentrate on few event types ⇒ low H.
      // H = ln(n) − (Σ nᵢ·ln nᵢ)/n from exact integer counts; each
      // ln-term is quantized to a 1e-6 long BEFORE the sum, so the
      // cross-type summation is order-independent exactly (group-agg
      // order is arbitrary in both engines) and only the precedented
      // ln-on-integer parity remains. Two map-side-combinable
      // aggregations over one user_id shuffle.
      (s, dir) => {
        val perType = Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("ni"))
        perType
          .withColumn("term_e6",
            floor(col("ni").cast("double") * log(col("ni").cast("double"))
              * 1e6 + 0.5).cast("long"))
          .groupBy("user_id")
          .agg(sum(col("ni")).as("n"), count(lit(1)).as("n_types"),
            sum(col("term_e6")).as("snl_e6"))
          .select(col("user_id"), col("n"), col("n_types"),
            round(log(col("n").cast("double"))
              - (col("snl_e6").cast("double") / 1e6) / col("n").cast("double"),
              4).as("entropy"))
          .orderBy("user_id")
      },
      Some("""
        WITH pt AS (
          SELECT user_id, event_type, count(*) AS ni
          FROM events GROUP BY 1, 2),
        q AS (
          SELECT user_id, ni,
                 CAST(floor(CAST(ni AS DOUBLE) * ln(CAST(ni AS DOUBLE))
                   * 1e6 + 0.5) AS BIGINT) AS term_e6
          FROM pt),
        g AS (
          SELECT user_id, CAST(sum(ni) AS BIGINT) AS n,
                 count(*) AS n_types,
                 CAST(sum(term_e6) AS BIGINT) AS snl_e6
          FROM q GROUP BY user_id)
        SELECT user_id, n, n_types,
               round(ln(CAST(n AS DOUBLE))
                 - (CAST(snl_e6 AS DOUBLE) / 1e6) / CAST(n AS DOUBLE), 4)
                 AS entropy
        FROM g ORDER BY user_id""")
    ),
    QueryDef(
      "anomaly_cusum",
      // One-sided CUSUM drift detection per event type over daily
      // totals. The textbook recursion max(0, prev + (x − target)) is
      // un-distributable, but it unrolls to the prefix-sum identity
      // CUSUM_t = S_t − min_{k≤t} S_k with S the running Σ(x − target) —
      // two stacked window passes over the same event_type shuffle.
      // target = the type's floor-mean daily total in exact cents (one
      // broadcast row per type); the whole pipeline is long arithmetic,
      // no float anywhere.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
        val target = daily.groupBy("event_type")
          .agg(expr("sum(x) div count(1)").as("target"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)
        daily.join(broadcast(target), "event_type")
          .withColumn("s", sum(col("x") - col("target")).over(w))
          .withColumn("smin", min(col("s")).over(w))
          .select(col("event_type"), col("day"),
            (col("s") - col("smin")).as("cusum_c"),
            ((col("s") - col("smin")) > col("target")).as("drifted"))
          .orderBy("event_type", "day")
      },
      Some("""
        WITH daily AS (
          SELECT event_type,
                 CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        t AS (
          SELECT event_type, CAST(sum(x) // count(*) AS BIGINT) AS target
          FROM daily GROUP BY 1),
        s AS (
          SELECT d.event_type, d.day,
                 CAST(sum(d.x - t.target) OVER (PARTITION BY d.event_type
                   ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
          FROM daily d JOIN t USING (event_type)),
        m AS (
          SELECT event_type, day, s,
                 CAST(min(s) OVER (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS smin
          FROM s)
        SELECT m.event_type, m.day, s - smin AS cusum_c,
               (s - smin) > t.target AS drifted
        FROM m JOIN t USING (event_type)
        ORDER BY event_type, day""")
    ),
    QueryDef(
      "window_bollinger",
      // Rolling Bollinger bands with a FULLY INTEGER outlier predicate:
      // the 30-day RANGE frame carries (n, Σx, Σx²) in exact longs, and
      // the |x − mean| > 2σ test is algebraically cleared of divisions —
      // (x·n − Σx)² > 4·(n·Σx² − (Σx)²) — so the flag never touches a
      // float; mean and σ surface as display columns only, rounded from
      // the same exact longs. One event_type shuffle serves the daily
      // aggregate and the window.
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
          .withColumn("xi", datediff(col("day"), lit("1990-01-01").cast("date")))
        val w = Window.partitionBy(col("event_type")).orderBy(col("xi"))
          .rangeBetween(-29, 0)
        val dev = col("x") * col("n") - col("s1")
        val disc = col("n") * col("s2") - col("s1") * col("s1")
        daily.select(col("event_type"), col("day"), col("x"),
            count(lit(1)).over(w).as("n"),
            sum(col("x")).over(w).as("s1"),
            sum(col("x") * col("x")).over(w).as("s2"))
          .select(col("event_type"), col("day"), col("n"),
            (floor(col("s1").cast("double") / col("n").cast("double") / 100.0
              * 10000 + 0.5) / 10000).as("mean"),
            (floor(sqrt(disc.cast("double")) / col("n").cast("double") / 100.0
              * 10000 + 0.5) / 10000).as("sigma"),
            (dev * dev > lit(4L) * disc).as("is_outlier"))
          .orderBy("event_type", "day")
      },
      Some("""
        WITH daily AS (
          SELECT event_type,
                 CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day,
                 CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
          FROM events GROUP BY 1, 2),
        d2 AS (
          SELECT event_type, day, x,
                 datediff('day', DATE '1990-01-01', day) AS xi
          FROM daily),
        s AS (
          SELECT event_type, day, x,
                 count(*) OVER w AS n,
                 CAST(sum(x) OVER w AS BIGINT) AS s1,
                 CAST(sum(x * x) OVER w AS BIGINT) AS s2
          FROM d2
          WINDOW w AS (PARTITION BY event_type ORDER BY xi
                       RANGE BETWEEN 29 PRECEDING AND CURRENT ROW))
        SELECT event_type, day, n,
               floor(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                 * 10000 + 0.5) / 10000 AS mean,
               floor(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                 / CAST(n AS DOUBLE) / 100.0 * 10000 + 0.5) / 10000 AS sigma,
               (x * n - s1) * (x * n - s1) > 4 * (n * s2 - s1 * s1)
                 AS is_outlier
        FROM s ORDER BY event_type, day""")
    ),
    QueryDef(
      "events_conversion_lag",
      // Signup→purchase conversion latency: exact GLOBAL p50/p95 of the
      // per-user lag. The global order statistic uses the TWO-PHASE
      // positional selection (orders_pareto's prefix-sum shape): range-
      // partition converting users by (lag, user), per-partition counts,
      // a ≤8-row offset scan broadcast back — rank positions without a
      // single-partition window over the users. Lags are integer
      // seconds; counts ride a one-row broadcast.
      (s, dir) => {
        val e = Tables.events(s, dir)
        // s1 has THREE consumers (p1's join, the lag join, the signup
        // count) and lags has two (the ranked selection and the one-row
        // count) — materialize both per-user frames once, or each
        // consumer re-scans and re-filters the events table (round 15:
        // five events passes collapse to two).
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("s_ts"))
          .materialized
        // No broadcast hint on s1: the signup table is per-user (unbounded
        // at scale) — the equi-join shuffles on user_id, and AQE still
        // broadcasts it when it measures small.
        val p1 = e.filter(col("event_type") === "purchase")
          .join(s1, "user_id")
          .filter(col("ts") >= col("s_ts"))
          .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
        val lags = s1.join(p1, Seq("user_id"))
          .select(col("user_id"),
            expr("(unix_micros(p_ts) - unix_micros(s_ts)) div 1000000")
              .as("lag_s"))
          .materialized
        val parts = lags.repartitionByRange(8, col("lag_s"), col("user_id"))
          .withColumn("pid", spark_partition_id())
        val offsets = parts.groupBy("pid").agg(count(lit(1)).as("pn"))
          .withColumn("offset",
            coalesce(sum(col("pn")).over(
              Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .select("pid", "offset")
        val nRow = lags.agg(count(lit(1)).as("n"))
          .crossJoin(s1.agg(count(lit(1)).as("n_signups")))
        parts.join(broadcast(offsets), "pid")
          .withColumn("rn", col("offset") + row_number().over(
            Window.partitionBy("pid").orderBy(col("lag_s"), col("user_id"))))
          .crossJoin(broadcast(nRow))
          .filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("(n * 95 + 99) div 100"))
          .groupBy()
          .agg(max(col("n_signups")).as("n_signups"),
            max(col("n")).as("n_converted"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("lag_s")))
              .as("p50_lag_s"),
            max(when(col("rn") === expr("(n * 95 + 99) div 100"), col("lag_s")))
              .as("p95_lag_s"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts
          FROM events),
        s1 AS (SELECT user_id, min(ts) AS s_ts FROM e
               WHERE event_type = 'signup' GROUP BY user_id),
        p1 AS (SELECT e.user_id, min(e.ts) AS p_ts
               FROM e JOIN s1 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts >= s1.s_ts
               GROUP BY e.user_id),
        lags AS (
          SELECT s1.user_id,
                 (epoch_us(p_ts) - epoch_us(s_ts)) // 1000000 AS lag_s
          FROM s1 JOIN p1 USING (user_id)),
        r AS (
          SELECT lag_s,
                 row_number() OVER (ORDER BY lag_s, user_id) AS rn,
                 count(*) OVER () AS n
          FROM lags)
        SELECT (SELECT count(*) FROM s1) AS n_signups,
               max(n) AS n_converted,
               max(CASE WHEN rn = (n + 1) // 2 THEN lag_s END) AS p50_lag_s,
               max(CASE WHEN rn = (n * 95 + 99) // 100 THEN lag_s END)
                 AS p95_lag_s
        FROM r WHERE rn = (n + 1) // 2 OR rn = (n * 95 + 99) // 100""")
    ),
    QueryDef(
      "events_attribution_multitouch",
      // Linear multi-touch attribution: each purchase splits 1e6 credit
      // units EQUALLY across the user's clicks in the prior 7 days
      // (events_attribution is the last-touch twin). Channels derive from
      // the props key (k mod 3). Credit per click is pure integer floor
      // division, so credit rounding stays deterministic; the pair join
      // keys on user_id with a time-band filter (per-user pairs bounded by
      // activity, never a cartesian).
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"), col("ts"),
          col("event_type"),
          (get_json_object(col("props"), "$.k").cast("long") % 3).as("ch"))
        val p2 = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"))
          .withColumn("pk", concat_ws("_", col("user_id"),
            unix_micros(col("pts"))))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts"), col("ch"))
        val pairs = p2.join(c, "user_id")
          .filter(col("cts") <= col("pts") &&
            col("cts") >= col("pts") - expr("INTERVAL 7 DAYS"))
        val perP = pairs.groupBy("pk").agg(count(lit(1)).as("n_c"))
        val perPCh = pairs.groupBy("pk", "ch").agg(count(lit(1)).as("c_ch"))
        perPCh.join(perP, "pk")
          .select(col("ch"), col("pk"),
            expr("c_ch * 1000000 div n_c").as("credit_e6"))
          .groupBy("ch")
          .agg(countDistinct(col("pk")).as("n_purchases"),
            sum(col("credit_e6")).as("credit_e6"))
          .orderBy("ch")
      },
      Some("""
        WITH e AS (
          SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
                 event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 AS ch
          FROM events),
        p AS (SELECT user_id, ts AS pts,
                     user_id || '_' || epoch_us(ts) AS pk
              FROM e WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts AS cts, ch FROM e WHERE event_type = 'click'),
        pairs AS (
          SELECT pk, ch FROM p JOIN c USING (user_id)
          WHERE cts <= pts AND cts >= pts - INTERVAL 7 DAY),
        np AS (SELECT pk, count(*) AS n_c FROM pairs GROUP BY 1),
        nch AS (SELECT pk, ch, count(*) AS c_ch FROM pairs GROUP BY 1, 2)
        SELECT ch, count(DISTINCT pk) AS n_purchases,
               CAST(sum((c_ch * 1000000) // n_c) AS BIGINT) AS credit_e6
        FROM nch JOIN np USING (pk)
        GROUP BY ch ORDER BY ch""")
    ),
    QueryDef(
      "events_powerlaw_alpha",
      // Power-law MLE over the user-activity distribution: α = 1 +
      // n / Σ ln(xᵢ/xmin) for users with xᵢ ≥ xmin = 2 — the heavy-tail
      // diagnostic behind engagement skew and salting decisions. Each
      // ln-term quantizes to a 1e-6 long BEFORE the sum (the
      // events_user_entropy precedent: order-independent summation, only
      // ln-on-integer parity remains); the final α is one double formula.
      (s, dir) => {
        val x = Tables.events(s, dir)
          .groupBy("user_id").agg(count(lit(1)).as("x"))
          .filter(col("x") >= 2)
        x.withColumn("term_e6",
            floor((log(col("x").cast("double")) - log(lit(2.0))) * 1e6 + 0.5)
              .cast("long"))
          .agg(count(lit(1)).as("n_users"), sum(col("term_e6")).as("st"))
          .select(col("n_users"),
            round(lit(1.0) + col("n_users").cast("double") /
              (col("st").cast("double") / 1e6), 4).as("alpha"))
      },
      Some("""
        WITH x AS (
          SELECT user_id, count(*) AS x FROM events
          GROUP BY 1 HAVING count(*) >= 2),
        t AS (
          SELECT CAST(floor((ln(CAST(x AS DOUBLE)) - ln(2.0)) * 1e6 + 0.5)
                   AS BIGINT) AS term_e6
          FROM x)
        SELECT count(*) AS n_users,
               round(1.0 + CAST(count(*) AS DOUBLE) /
                 (CAST(sum(term_e6) AS DOUBLE) / 1e6), 4) AS alpha
        FROM t""")
    )
  )
}
