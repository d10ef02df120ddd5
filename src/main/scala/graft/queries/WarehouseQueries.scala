package graft.queries

import graft.ops.SparkOps.Materialize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-join warehouse analytics — TPC-H-shaped query plans exercising
  * Catalyst's join planning end-to-end (star joins with explicit dimension
  * broadcast, group-then-semi-join HAVING shapes, decorrelated per-group
  * averages, two-level dimension self-aliasing) plus marketing attribution
  * over the event stream.
  *
  * Scale posture (the reason these queries exist): at 100 TB the fact
  * tables (`lineitem`, `orders`, `events`) shuffle ONLY on their join keys
  * (`l_orderkey`/`o_orderkey`, `user_id`), every dimension side is
  * broadcast, and each aggregation is declared so partial (map-side)
  * aggregation applies. Money arithmetic uses [[Tables.moneySum]] exact
  * cent quanta so results are partition-order independent and match the
  * DuckDB oracle bit-for-bit; threshold predicates are evaluated in exact
  * integer quanta (never on accumulated doubles) so boundary rows cannot
  * flip between engines.
  *
  * Reference surface: composed Extract→Transform pipelines over Spark
  * frames (/root/reference/docs/examples-spark.md:30-75); the query
  * SHAPES are the public TPC-H workload re-expressed on the synthetic
  * star schema.
  */
object WarehouseQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  def queries: Seq[QueryDef] = Seq(
    // ------------------------------------------------- Q3 shipping priority
    QueryDef(
      "tpch_q3_top_orders",
      (s, dir) => {
        // Unshipped-revenue top-10: the classic fact⋈fact join on the
        // order key with a broadcast customer filter. lineitem⋈orders
        // shuffles once on the order key; the segment-filtered customer
        // dim broadcasts into that stage, so the whole query is ONE
        // exchange per fact table plus a TakeOrderedAndProject.
        val cut = lit("1999-06-30").cast("timestamp")
        val c = broadcast(
          t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
            .select("c_custkey"))
        val o = t(s, dir, "orders").filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val l = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .orderBy(desc("revenue"), col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-06-30'
          AND l_shipdate  > TIMESTAMP '1999-06-30'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")
    ),
    // ------------------------------------------------ Q5 local supplier rev
    QueryDef(
      "tpch_q5_local_supplier",
      (s, dir) => {
        // Six-table snowflake with the "local supplier" twist: the
        // customer and the line's supplier must share a nation. All four
        // dimensions broadcast; the only shuffles are lineitem⋈orders on
        // the order key and the customer join on o_custkey.
        val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
        val n = broadcast(t(s, dir, "nation"))
        val su = broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"))
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val l = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .join(c, o("o_custkey") === c("c_custkey") &&
            c("c_nationkey") === su("s_nationkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      Some("""
        SELECT n_name,
               floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")
    ),
    // --------------------------------------------------- Q18 large orders
    QueryDef(
      "tpch_q18_large_orders",
      (s, dir) => {
        // HAVING-over-fact semi-join: aggregate lineitem once, keep only
        // orders whose total quantity clears the threshold, then enrich.
        // The heavy side aggregates BEFORE any join (map-side combine on
        // l_orderkey), so the join input is already order-grain —
        // quantities are integral doubles, exact under summation to 2^53,
        // so the >300 boundary cannot flip between engines.
        val l = t(s, dir, "lineitem")
        val big = l.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300)
        val o = t(s, dir, "orders")
        val c = broadcast(t(s, dir, "customer").select("c_custkey", "c_name"))
        o.join(big, o("o_orderkey") === big("l_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"),
            round(col("sum_qty"), 2).as("sum_qty"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
      },
      Some("""
        WITH big AS (
          SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM orders
        JOIN big      ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey""")
    ),
    // ------------------------------------------- Q17 small-quantity revenue
    QueryDef(
      "tpch_q17_small_qty_revenue",
      (s, dir) => {
        // Correlated-average shape, decorrelated by hand the way Catalyst
        // rewrites it: the per-part average joins back to the lines as an
        // aggregate, never as a per-row subquery. The boundary predicate
        // `q < 0.2 * avg(q)` is evaluated in exact integer quanta
        // (qq·cnt·5 < Σqq) — algebraically identical, but immune to the
        // last-ulp double divergence a literal avg() comparison has.
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_brand") === "Brand#13").select("p_partkey"))
        val l = t(s, dir, "lineitem")
          .join(p, col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"),
            floor(col("l_quantity") * 100 + 0.5).cast("long").as("qq"),
            col("l_extendedprice"))
        val st = l.groupBy(col("l_partkey"))
          .agg(sum(col("qq")).as("tot"), count(lit(1)).as("cnt"))
        l.join(st, "l_partkey")
          .filter(col("qq") * col("cnt") * 5 < col("tot"))
          .agg(round(Tables.moneySum(col("l_extendedprice")) / 7.0, 2)
            .as("avg_yearly"))
      },
      Some("""
        WITH lj AS (
          SELECT l_partkey, CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qq,
                 l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#13'),
        st AS (SELECT l_partkey, sum(qq) AS tot, count(*) AS cnt FROM lj GROUP BY l_partkey)
        SELECT round(floor((sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 / 7.0, 2) AS avg_yearly
        FROM lj JOIN st USING (l_partkey)
        WHERE qq * cnt * 5 < tot""")
    ),
    // --------------------------------------------------- Q8 market share
    QueryDef(
      "tpch_q8_market_share",
      (s, dir) => {
        // National market share by year: the nation dimension participates
        // TWICE (customer's nation restricts the market region; supplier's
        // nation is the share numerator) — two independent broadcast
        // aliases of the same dim, the standard snowflake self-alias. The
        // share is a ratio of exact cent-quanta sums, computed per group
        // AFTER aggregation — one double division on identical longs.
        val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
        val nCust = broadcast(t(s, dir, "nation"))
        val nSupp = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("sn_nationkey"), col("n_name").as("supp_nation")))
        val su = broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"))
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
        val l = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        val quanta = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + 0.5)
          .cast("long")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(nCust, c("c_nationkey") === nCust("n_nationkey"))
          .join(r, nCust("n_regionkey") === r("r_regionkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .join(nSupp, su("s_nationkey") === col("sn_nationkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3", quanta).otherwise(lit(0L)))
              .as("nat_rev"),
            sum(quanta).as("tot_rev"))
          .select(col("o_year"),
            round(col("nat_rev") / col("tot_rev"), 6).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               round(sum(CASE WHEN sn.n_name = 'NATION_3'
                              THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                              ELSE 0 END)
                     / sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)),
                     6) AS mkt_share
        FROM lineitem
        JOIN orders       ON l_orderkey = o_orderkey
        JOIN customer     ON o_custkey = c_custkey
        JOIN nation  cn   ON c_nationkey = cn.n_nationkey
        JOIN region       ON cn.n_regionkey = r_regionkey
        JOIN supplier     ON l_suppkey = s_suppkey
        JOIN nation  sn   ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY o_year
        ORDER BY o_year""")
    ),
    // ------------------------------------------------ Q10 returned items
    QueryDef(
      "tpch_q10_returned_items",
      (s, dir) => {
        // Top-20 customers by revenue lost to returns in one year: fact
        // tables shuffle once on the order key; customer is the probe side
        // of a broadcast of the filtered aggregate? No — customer is
        // dimension-sized here, so IT broadcasts and the aggregation runs
        // on the fact grain, finishing in a TakeOrderedAndProject.
        val c = broadcast(t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"))
        val n = broadcast(t(s, dir, "nation").select("n_nationkey", "n_name"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .orderBy(desc("revenue"), col("c_custkey"))
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate <  TIMESTAMP '1999-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")
    ),
    // -------------------------------------------------- Q14 promo revenue
    QueryDef(
      "tpch_q14_promo_share",
      (s, dir) => {
        // Conditional-aggregate share: what fraction of a quarter's
        // revenue came from PROMO parts. One broadcast dim join, one
        // map-side-combinable aggregate, a ratio of exact cent quanta —
        // the single-output-row report shape.
        val p = broadcast(t(s, dir, "part").select("p_partkey", "p_type"))
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
          .select("l_partkey", "l_extendedprice", "l_discount")
        val quanta = floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + 0.5)
          .cast("long")
        l.join(p, l("l_partkey") === p("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", quanta).otherwise(lit(0L))).as("promo"),
            sum(quanta).as("total"))
          .select(round(lit(100.0) * col("promo") / col("total"), 4).as("promo_pct"))
      },
      Some("""
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                       THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                       ELSE 0 END)
                     / sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)),
                     4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1998-04-01'""")
    ),
    // ------------------------------------------------ Q7 two-nation volume
    QueryDef(
      "tpch_q7_nation_volume",
      (s, dir) => {
        // Bilateral trade volume: supplier nation × customer nation
        // restricted to one unordered country pair, by year. The nation
        // dim joins twice under different roles (the Q8 self-alias again,
        // but with the pair predicate ACROSS the two aliases); facts
        // shuffle once each, dims broadcast.
        val nSupp = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
        val nCust = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
        val su = broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"))
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val l = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .join(nSupp, su("s_nationkey") === col("sn_key"))
          .join(nCust, c("c_nationkey") === col("cn_key"))
          .filter(
            (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
            (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some("""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS revenue
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
           OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")
    ),
    // ------------------------------------------- Q13 order-count histogram
    QueryDef(
      "tpch_q13_order_histogram",
      (s, dir) => {
        // Customer distribution by order count INCLUDING zero-order
        // customers: a left outer join whose count must count ORDERS, not
        // rows (count(o_orderkey), null-aware), then a second aggregation
        // over the counts — the double-grouping shape. A priority filter
        // stands in for TPC-H's comment NOT LIKE.
        val c = t(s, dir, "customer").select("c_custkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_orderkey", "o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""
        WITH cc AS (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey)
        SELECT c_count, count(*) AS custdist
        FROM cc GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")
    ),
    // --------------------------------------------------- Q15 top supplier
    QueryDef(
      "tpch_q15_top_supplier",
      (s, dir) => {
        // Argmax over an aggregate: quarterly revenue per supplier, keep
        // the supplier(s) achieving the maximum. The max rides back as a
        // broadcast 1-row join against the (already supplier-grain)
        // aggregate — no second scan of lineitem, no window over the
        // whole aggregate. Revenue compared in exact cent quanta so the
        // max-equality predicate cannot split across engines.
        val su = broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name"))
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-04-01").cast("timestamp"))
        val rev = l.groupBy(col("l_suppkey"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + 0.5)
            .cast("long")).as("rev_q"))
        val top = rev.agg(max(col("rev_q")).as("max_q"))
        rev.crossJoin(broadcast(top))
          .filter(col("rev_q") === col("max_q"))
          .join(su, col("l_suppkey") === su("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            (floor((col("rev_q") + 50) / 100) / 100.0).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS rev_q
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1998-01-01'
            AND l_shipdate <  TIMESTAMP '1998-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               floor((rev_q + 50) / 100) / 100.0 AS total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_q = (SELECT max(rev_q) FROM rev)
        ORDER BY s_suppkey""")
    ),
    // -------------------------------------------------- Q4 late shipments
    QueryDef(
      "tpch_q4_priority_lateness",
      (s, dir) => {
        // EXISTS-shaped fact-fact correlation: count orders per priority
        // that had at least one line shipped > 90 days after the order
        // date. The subquery decorrelates to a LEFT SEMI join on the
        // order key — one shuffle each side, no per-order probe — and the
        // lateness predicate evaluates BEFORE the join, shrinking the
        // semi-join's build input to just the late lines.
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        val late = l.join(o.select("o_orderkey", "o_orderdate"),
            l("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select(col("l_orderkey"))
        o.join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    ),
    // --------------------------------------------------- Q6 revenue delta
    QueryDef(
      "tpch_q6_revenue_delta",
      (s, dir) => {
        // Pure scan-side query: every predicate (date range, discount
        // band, quantity cap) pushes to the parquet scan, and the single
        // aggregate partial-combines — the "how much would revenue change"
        // what-if that TPC-H uses to measure raw scan throughput.
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(Tables.moneySum(col("l_extendedprice") * col("l_discount"))
            .as("revenue"))
      },
      Some("""
        SELECT floor((sum(CAST(floor((l_extendedprice * l_discount) * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1999-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""")
    ),
    // ---------------------------------------------- Q19 disjunctive join
    QueryDef(
      "tpch_q19_disjunctive",
      (s, dir) => {
        // OR-of-ANDs across both join sides: each disjunct pairs a brand
        // with its own size and quantity bands. The join key stays a pure
        // equi-join (partkey); the disjunction evaluates as a post-join
        // filter over the broadcast dim — Catalyst keeps the hash join
        // and pushes what it can (the OR of brands) to the dim scan.
        val p = broadcast(t(s, dir, "part").select("p_partkey", "p_brand", "p_size"))
        val l = t(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        val disj =
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))
        l.join(p, l("l_partkey") === p("p_partkey"))
          .filter(disj)
          .agg(Tables.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
      },
      Some("""
        SELECT floor((sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)""")
    ),
    // ------------------------------------------------ Q22 idle customers
    QueryDef(
      "tpch_q22_idle_rich",
      (s, dir) => {
        // Above-average-balance customers with no RECENT orders (lapsed
        // high-value accounts): a scalar aggregate broadcast as a 1-row
        // join + a left-anti join against the date-filtered orders fact —
        // the decorrelated NOT EXISTS plan Catalyst produces for Q22. The
        // date filter prunes the fact BEFORE its anti-join shuffle.
        val c = t(s, dir, "customer")
        val avgBal = c.filter(col("c_acctbal") > 0)
          .agg(avg(col("c_acctbal")).as("avg_bal"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select("o_custkey")
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_cust"),
            Tables.moneySum(col("c_acctbal")).as("total_bal"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_cust,
               floor((sum(CAST(floor(c_acctbal * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total_bal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1999-01-01')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    ),
    // ------------------------------------------- Q2 min-cost supplier
    QueryDef(
      "tpch_q2_min_cost_supplier",
      (s, dir) => {
        // TPC-H Q2's correlated-min shape on the cut-down schema: the
        // lineitem (part, supplier) pairs stand in for partsupp, with the
        // pair's cheapest observed line price as the supply cost. The
        // correlated `cost = min(cost) per part` subquery decorrelates to
        // an aggregate joined back on (partkey, cost) — and BOTH dimension
        // filters (LARGE parts, EUROPE suppliers) broadcast into the fact
        // scan BEFORE the pair-grain shuffle, since the per-part min is
        // invariant to dropping other parts' rows. At 100 TB that prunes
        // the shuffle ~30× vs aggregating every pair first. Costs compare
        // as exact cent quanta so min-equality cannot split.
        val costQ = floor(col("l_extendedprice") * 10000 + 0.5).cast("long")
        val suEu = broadcast(
          t(s, dir, "supplier")
            .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
            .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_type") === "LARGE" && col("p_size").between(10, 20))
          .select("p_partkey", "p_type"))
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"), costQ.as("cost_q"))
          .join(p, col("l_partkey") === p("p_partkey"))
          .join(suEu, col("l_suppkey") === suEu("s_suppkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"), col("p_partkey"),
            col("p_type"), col("s_name"), col("s_acctbal"), col("n_name"))
          .agg(min(col("cost_q")).as("cost_q"))
        val minc = ps.groupBy(col("l_partkey").as("mp_key"))
          .agg(min(col("cost_q")).as("min_q"))
        ps.join(minc, ps("l_partkey") === col("mp_key") &&
            ps("cost_q") === col("min_q"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_type"),
            (floor((col("cost_q") + 50) / 100) / 100.0).as("min_cost"))
          .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey,
                 min(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS cost_q
          FROM lineitem GROUP BY 1, 2),
        eu AS (
          SELECT ps.l_partkey, ps.cost_q, s_acctbal, s_name, n_name
          FROM ps
          JOIN supplier ON ps.l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE')
        SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
               floor((cost_q + 50) / 100) / 100.0 AS min_cost
        FROM eu JOIN part ON eu.l_partkey = p_partkey
        WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
          AND cost_q = (SELECT min(e2.cost_q) FROM eu e2
                        WHERE e2.l_partkey = eu.l_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100""")
    ),
    // ------------------------------------------- Q9 product-type profit
    QueryDef(
      "tpch_q9_product_profit",
      (s, dir) => {
        // Profit by supplier nation and order year for one part family
        // (TPC-H Q9 with p_retailprice·quantity standing in for
        // ps_supplycost·quantity). Five-table snowflake where only the
        // two facts shuffle (lineitem⋈orders on the order key); part,
        // supplier, nation broadcast. Profit is computed per row in exact
        // 1e-4 quanta — revenue quanta minus cost quanta — so the sum is
        // partition-order independent and engine-exact.
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_name").like("%widget%"))
          .select(col("p_partkey"),
            floor(col("p_retailprice") * 100 + 0.5).cast("long").as("cost_c")))
        val su = broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"))
        val n = broadcast(t(s, dir, "nation").select("n_nationkey", "n_name"))
        val o = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
        val l = t(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount")
        val profitQ =
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000 + 0.5)
            .cast("long") -
          col("cost_c") * col("l_quantity").cast("long") * lit(100L)
        l.join(p, l("l_partkey") === p("p_partkey"))
          .join(su, l("l_suppkey") === su("s_suppkey"))
          .join(n, su("s_nationkey") === n("n_nationkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg((floor((sum(profitQ) + 50) / 100) / 100.0).as("sum_profit"))
          .orderBy(col("nation"), desc("o_year"))
      },
      Some("""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)
                          - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                            * CAST(l_quantity AS BIGINT) * 100) + 50) / 100) / 100.0
                 AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC""")
    ),
    // ------------------------------------------- Q11 important stock
    QueryDef(
      "tpch_q11_important_stock",
      (s, dir) => {
        // Parts holding an outsized share of one region's supply value
        // (TPC-H Q11's HAVING-over-scalar-subquery). The global total and
        // part count ride back as a broadcast 1-row join; the share
        // predicate `value · n_parts > 2 · total` stays in exact integer
        // quanta (no division), so the cut is scale-stable — roughly the
        // same FRACTION of parts passes at every SF — and boundary-exact.
        val suAsia = broadcast(
          t(s, dir, "supplier")
            .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
            .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
            .select("s_suppkey"))
        val vals = t(s, dir, "lineitem")
          .join(suAsia, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey").as("ps_partkey"))
          .agg(sum(floor(col("l_extendedprice") * 10000 + 0.5).cast("long"))
            .as("val_q"))
        val tot = vals.agg(sum(col("val_q")).as("tot_q"),
          count(lit(1)).as("n_parts"))
        vals.crossJoin(broadcast(tot))
          .filter(col("val_q") * col("n_parts") > col("tot_q") * 2)
          .select(col("ps_partkey"),
            (floor((col("val_q") + 50) / 100) / 100.0).as("stock_value"))
          .orderBy(desc("stock_value"), col("ps_partkey"))
      },
      Some("""
        WITH v AS (
          SELECT l_partkey AS ps_partkey,
                 sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) AS val_q
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
          GROUP BY 1)
        SELECT ps_partkey, floor((val_q + 50) / 100) / 100.0 AS stock_value
        FROM v
        WHERE val_q * (SELECT count(*) FROM v) > 2 * (SELECT sum(val_q) FROM v)
        ORDER BY stock_value DESC, ps_partkey""")
    ),
    // ------------------------------------------- Q12 lateness by ship class
    QueryDef(
      "tpch_q12_ship_class",
      (s, dir) => {
        // TPC-H Q12's conditional-sum-after-join, with a derived SLOW/FAST
        // ship class standing in for l_shipmode (the schema carries no
        // mode column): did late shipping correlate with order priority?
        // One fact⋈fact join on the order key, the CASE sums partial-
        // aggregate map-side onto two output rows.
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_orderdate", "o_orderpriority")
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_shipdate")
        val high = col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH"
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .select(
            when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"),
              lit("SLOW")).otherwise(lit("FAST")).as("ship_class"),
            when(high, 1L).otherwise(0L).as("is_high"))
          .groupBy(col("ship_class"))
          .agg(sum(col("is_high")).as("high_line_count"),
            sum(lit(1L) - col("is_high")).as("low_line_count"))
          .orderBy(col("ship_class"))
      },
      Some("""
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 120 DAY
                    THEN 'SLOW' ELSE 'FAST' END AS ship_class,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY ship_class
        ORDER BY ship_class""")
    ),
    // ------------------------------------------- Q16 supplier-part counts
    QueryDef(
      "tpch_q16_supplier_part_count",
      (s, dir) => {
        // Distinct-supplier counts per part attribute triple, excluding a
        // NOT-IN supplier list (TPC-H Q16; below-average balance stands in
        // for the complaint-comment scan). The exclusion decorrelates to a
        // broadcast LEFT ANTI join on the fact scan — never a per-row
        // probe — and both it and the part filter apply BEFORE the
        // distinct's pair-grain shuffle (dropping rows by key commutes
        // with distinct-on-those-keys), so at 100 TB only surviving pairs
        // shuffle. The count-distinct then runs on the already-distinct
        // pair grain. The below-average predicate is EXACT-INTEGER, the
        // repo convention (Q11/Q20): balances in cent quanta,
        // cross-multiplied against (count, sum) — `bal·n < Σbal` — so no
        // partition-order-dependent double summation can flip membership
        // at the mean boundary.
        val sup = t(s, dir, "supplier").select(col("s_suppkey"),
          floor(col("s_acctbal") * 100 + 0.5).cast("long").as("bal_q"))
        val tot = sup.agg(count(lit(1)).as("n_sup"), sum(col("bal_q")).as("sum_q"))
        val excl = broadcast(sup.crossJoin(broadcast(tot))
          .filter(col("bal_q") * col("n_sup") < col("sum_q"))
          .select("s_suppkey"))
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#45" &&
            col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
          .select("p_partkey", "p_brand", "p_type", "p_size"))
        t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
          .join(excl, col("l_suppkey") === excl("s_suppkey"), "left_anti")
          .join(p, col("l_partkey") === p("p_partkey"))
          .select("l_partkey", "l_suppkey", "p_brand", "p_type", "p_size")
          .distinct()
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier
            WHERE CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) *
                    (SELECT count(*) FROM supplier)
                  < (SELECT sum(CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT))
                     FROM supplier))
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    ),
    // ------------------------------------------- Q20 dominant suppliers
    QueryDef(
      "tpch_q20_dominant_suppliers",
      (s, dir) => {
        // Suppliers who shipped an outsized share (>30%) of any small-part
        // family's annual volume (TPC-H Q20's nested-aggregate semi-join,
        // with shipped share standing in for the availqty comparison).
        // Both aggregates run on the same pair-grain pass; the share
        // predicate compares integer quantity sums cross-multiplied — no
        // division — and the qualifying pairs semi-join into the supplier
        // dim, so the fact is never scanned twice.
        val p = broadcast(t(s, dir, "part")
          .filter(col("p_name").like("small%")).select("p_partkey"))
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(p, col("l_partkey") === p("p_partkey"))
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long").as("qty"))
        val bySupp = l.groupBy("l_partkey", "l_suppkey")
          .agg(sum(col("qty")).as("sq"))
        val byPart = bySupp.groupBy(col("l_partkey").as("tp_key"))
          .agg(sum(col("sq")).as("tq"))
        val qual = bySupp.join(byPart, col("l_partkey") === col("tp_key"))
          .filter(col("sq") * 10 > col("tq") * 3)
          .select(col("l_suppkey"))
        val n = broadcast(t(s, dir, "nation").select("n_nationkey", "n_name"))
        t(s, dir, "supplier")
          .join(qual, col("s_suppkey") === qual("l_suppkey"), "left_semi")
          .join(n, col("s_nationkey") === n("n_nationkey"))
          .select(col("s_name"), col("n_name"))
          .orderBy(col("s_name"))
      },
      Some("""
        WITH sq AS (
          SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS sq
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY 1, 2),
        tq AS (SELECT l_partkey, sum(sq) AS tq FROM sq GROUP BY 1)
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM sq JOIN tq USING (l_partkey)
          WHERE sq.sq * 10 > tq.tq * 3)
        ORDER BY s_name""")
    ),
    // ------------------------------------------- Q21 waiting suppliers
    QueryDef(
      "tpch_q21_waiting_suppliers",
      (s, dir) => {
        // Suppliers who were the SOLE late shipper on multi-supplier
        // finished orders (TPC-H Q21's EXISTS + NOT-EXISTS pair, with
        // `shipdate > orderdate + 90 days` as the lateness predicate in
        // place of receipt/commit dates). Both correlated quantifiers
        // decorrelate through ONE (order, supplier)-grain aggregate that
        // carries the late-LINE count per pair: the fact is scanned and
        // pair-aggregated once (both downstream consumers reuse that
        // exchange), order-grain stats reduce the already-small pair rows,
        // and numwait = Σ late_lines reproduces the spec's per-l1-row
        // count — no second fact scan, no countDistinct Expand.
        val oF = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate")
        val pairAgg = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
          .join(oF, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(sum(
            when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
              1L).otherwise(0L)).as("late_lines"))
        val stats = pairAgg.groupBy(col("l_orderkey").as("st_key"))
          .agg(count(lit(1)).as("ns"),
            sum(when(col("late_lines") > 0, 1L).otherwise(0L)).as("nl"))
        val su = broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name"))
        pairAgg.filter(col("late_lines") > 0)
          .join(stats, col("l_orderkey") === col("st_key"))
          .filter(col("ns") > 1 && col("nl") === 1)
          .join(su, col("l_suppkey") === su("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(sum(col("late_lines")).as("numwait"))
          .orderBy(desc("numwait"), col("s_name"))
          .limit(100)
      },
      Some("""
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100""")
    ),
    // ------------------------------------------------- 3-step user paths
    QueryDef(
      "events_paths_top",
      (s, dir) => {
        // Sequence mining one order up from the bigram transition matrix:
        // the top-10 3-step event paths. Same single user_id shuffle, two
        // leads over one window pass, a path groupBy that map-side
        // combines onto |types|³ rows max, and a TakeOrderedAndProject.
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .filter(col("e3").isNotNull)
          .groupBy(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("path"))
          .limit(10)
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type,
                 epoch_ns(ts) // 1000 AS ts_us
          FROM events),
        seq AS (
          SELECT event_type AS e1,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY path
        ORDER BY n DESC, path
        LIMIT 10""")
    ),
    QueryDef(
      "orders_basket_size",
      // Basket-size distribution: line count per order, histogrammed —
      // the order-composition profile behind picking/packing capacity and
      // join-size estimates. Two partial-agg shuffles, no window.
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("basket"))
          .groupBy("basket")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("basket"),
      Some("""
        WITH b AS (SELECT l_orderkey, count(*) AS basket
                   FROM lineitem GROUP BY 1)
        SELECT basket, count(*) AS n_orders
        FROM b GROUP BY 1 ORDER BY basket""")
    ),
    QueryDef(
      "market_concentration_hhi",
      // Herfindahl–Hirschman concentration per part type: Σ over
      // suppliers of (revenue share)² — the market-structure metric (and
      // the skew diagnostic that motivates salting). Each squared share
      // quantizes to a 1e-9 long BEFORE the cross-supplier sum (order-
      // independent); shares form from exact cent totals with identical
      // division order in both engines.
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part").select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_type"), col("l_suppkey"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("rev_c"))
        val tot = rev.groupBy("p_type").agg(sum(col("rev_c")).as("tot_c"))
        rev.join(broadcast(tot), "p_type")
          .withColumn("term_e9", floor(
            (col("rev_c").cast("double") / col("tot_c").cast("double")) *
            (col("rev_c").cast("double") / col("tot_c").cast("double"))
            * 1e9 + 0.5).cast("long"))
          .groupBy("p_type")
          .agg(count(lit(1)).as("n_suppliers"),
            round(sum(col("term_e9")).cast("double") / 1e9, 6).as("hhi"))
          .orderBy("p_type")
      },
      Some("""
        WITH rev AS (
          SELECT p_type, l_suppkey,
                 CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev_c
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        tot AS (SELECT p_type, CAST(sum(rev_c) AS BIGINT) AS tot_c
                FROM rev GROUP BY 1),
        terms AS (
          SELECT rev.p_type,
                 CAST(floor(
                   (CAST(rev_c AS DOUBLE) / CAST(tot_c AS DOUBLE)) *
                   (CAST(rev_c AS DOUBLE) / CAST(tot_c AS DOUBLE))
                   * 1e9 + 0.5) AS BIGINT) AS term_e9
          FROM rev JOIN tot USING (p_type))
        SELECT p_type, count(*) AS n_suppliers,
               round(CAST(sum(term_e9) AS DOUBLE) / 1e9, 6) AS hhi
        FROM terms GROUP BY p_type ORDER BY p_type""")
    ),
    QueryDef(
      "basket_association_rules",
      // Directed association rules over part-type co-purchase: support,
      // confidence, lift per a→b. Directed pairs come straight from the
      // distinct (order, type) self-join (≤30 per order — categories, not
      // items, keep the expansion bounded); the per-type counts and the
      // one-row order total broadcast. Every metric is an exact-count
      // ratio with identical double op order in both engines.
      (s, dir) => {
        val p = broadcast(t(s, dir, "part").select("p_partkey", "p_type"))
        val ot = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
          .join(p, col("l_partkey") === col("p_partkey"))
          .select("l_orderkey", "p_type").distinct()
          .materialized
        val totals = ot.select("l_orderkey").distinct()
          .agg(count(lit(1)).as("n_total"))
        val perType = ot.groupBy(col("p_type")).agg(count(lit(1)).as("n_t"))
        val a = ot.toDF("ok", "antecedent")
        val b = ot.toDF("ok", "consequent")
        a.join(b, "ok")
          .filter(col("antecedent") =!= col("consequent"))
          .groupBy("antecedent", "consequent")
          .agg(count(lit(1)).as("n_ab"))
          .join(broadcast(perType.toDF("antecedent", "n_a")), "antecedent")
          .join(broadcast(perType.toDF("consequent", "n_b")), "consequent")
          .crossJoin(broadcast(totals))
          .select(col("antecedent"), col("consequent"), col("n_ab"),
            round(col("n_ab").cast("double") / col("n_total").cast("double"), 6)
              .as("support"),
            round(col("n_ab").cast("double") / col("n_a").cast("double"), 6)
              .as("confidence"),
            round((col("n_ab").cast("double") * col("n_total").cast("double")) /
              (col("n_a").cast("double") * col("n_b").cast("double")), 6)
              .as("lift"))
          .orderBy("antecedent", "consequent")
      },
      Some("""
        WITH ot AS (
          SELECT DISTINCT l_orderkey, p_type
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        tot AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM ot),
        pt AS (SELECT p_type, count(*) AS n_t FROM ot GROUP BY 1),
        ab AS (
          SELECT a.p_type AS antecedent, b.p_type AS consequent,
                 count(*) AS n_ab
          FROM ot a JOIN ot b
            ON a.l_orderkey = b.l_orderkey AND a.p_type <> b.p_type
          GROUP BY 1, 2)
        SELECT antecedent, consequent, n_ab,
               round(CAST(n_ab AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
                 AS support,
               round(CAST(n_ab AS DOUBLE) / CAST(pa.n_t AS DOUBLE), 6)
                 AS confidence,
               round((CAST(n_ab AS DOUBLE) * CAST(n_total AS DOUBLE)) /
                     (CAST(pa.n_t AS DOUBLE) * CAST(pb.n_t AS DOUBLE)), 6)
                 AS lift
        FROM ab
          JOIN pt pa ON pa.p_type = antecedent
          JOIN pt pb ON pb.p_type = consequent, tot
        ORDER BY antecedent, consequent""")
    ),
    QueryDef(
      "experiment_readout",
      // A/B experiment readout: deterministic variant assignment
      // (user_id parity — the hash-mod keying every RNG-free splitter
      // here uses), conversion + revenue per arm. Counting stays integer;
      // rates and ARPU are final-projection divisions. The shape every
      // growth team ships daily.
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            floor(col("value") * 100 + 0.5).cast("long").as("vc"),
            when(col("user_id") % 2 === 0, "A").otherwise("B").as("variant"))
        val users = e.select("variant", "user_id").distinct()
          .groupBy("variant").agg(count(lit(1)).as("n_users"))
        val conv = e.filter(col("event_type") === "purchase")
          .select("variant", "user_id").distinct()
          .groupBy("variant").agg(count(lit(1)).as("converters"))
        val rev = e.filter(col("event_type") === "purchase")
          .groupBy("variant").agg(sum(col("vc")).as("rev_c"))
        users.join(conv, "variant").join(rev, "variant")
          .select(col("variant"), col("n_users"), col("converters"),
            round(col("converters").cast("double") / col("n_users").cast("double"), 6)
              .as("conv_rate"),
            col("rev_c"),
            round(col("rev_c").cast("double") / col("n_users").cast("double"), 4)
              .as("arpu_cents"))
          .orderBy("variant")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
                 CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
          FROM events),
        u AS (SELECT variant, count(DISTINCT user_id) AS n_users
              FROM e GROUP BY 1),
        c AS (SELECT variant, count(DISTINCT user_id) AS converters
              FROM e WHERE event_type = 'purchase' GROUP BY 1),
        r AS (SELECT variant, CAST(sum(vc) AS BIGINT) AS rev_c
              FROM e WHERE event_type = 'purchase' GROUP BY 1)
        SELECT variant, n_users, converters,
               round(CAST(converters AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
                 AS conv_rate,
               rev_c,
               round(CAST(rev_c AS DOUBLE) / CAST(n_users AS DOUBLE), 4)
                 AS arpu_cents
        FROM u JOIN c USING (variant) JOIN r USING (variant)
        ORDER BY variant""")
    ),
    // ------------------------------------------------- market basket pairs
    QueryDef(
      "basket_type_pairs",
      (s, dir) => {
        // Co-purchase affinity between part TYPES: distinct types per
        // order (bounded by |types| = 6, so the per-order pair expansion
        // is ≤ 15 rows however many lines an order has), exploded to
        // unordered pairs, counted. The classic market-basket 2-itemset
        // support, kept scale-safe by pairing CATEGORIES, not items.
        val p = broadcast(t(s, dir, "part").select("p_partkey", "p_type"))
        t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("p_type"))).as("types"))
          // sequence(0, -1) DESCENDS in Spark — a single-type order must
          // never reach the pair expansion.
          .filter(size(col("types")) >= 2)
          .select(explode(expr(
            """flatten(transform(sequence(0, size(types) - 2), i ->
                 transform(sequence(i + 1, size(types) - 1), j ->
                   struct(types[i] AS t1, types[j] AS t2))))""")).as("pr"))
          .groupBy(col("pr.t1").as("type_a"), col("pr.t2").as("type_b"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("type_a", "type_b")
      },
      Some("""
        WITH ot AS (
          SELECT DISTINCT l_orderkey, p_type
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT a.p_type AS type_a, b.p_type AS type_b, count(*) AS n_orders
        FROM ot a JOIN ot b
          ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
        GROUP BY type_a, type_b
        ORDER BY type_a, type_b""")
    ),
    // ---------------------------------------------- last-touch attribution
    QueryDef(
      "events_attribution",
      (s, dir) => {
        // Last-touch marketing attribution: each purchase credits the most
        // recent preceding click/view by the same user — an as-of lookup
        // realized as ONE pass with a running `last(..., ignoreNulls)`
        // window partitioned by user (state is a single value per user;
        // no join, no per-row scan-back). Event-id breaks same-microsecond
        // ties so the carried touch is deterministic in both engines.
        val e = Tables.events(s, dir)
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.withColumn("touch",
            when(col("event_type").isin("click", "view"), col("event_type")))
          .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .groupBy(coalesce(col("last_touch"), lit("none")).as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            Tables.moneySum(col("value")).as("total_value"))
          .orderBy(col("channel"))
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type, value,
                 epoch_ns(ts) // 1000 AS ts_us
          FROM events),
        tagged AS (
          SELECT event_type, value,
                 last_value(CASE WHEN event_type IN ('click', 'view')
                                 THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_touch
          FROM e)
        SELECT coalesce(last_touch, 'none') AS channel,
               count(*) AS n_purchases,
               floor((sum(CAST(floor(value * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total_value
        FROM tagged
        WHERE event_type = 'purchase'
        GROUP BY channel
        ORDER BY channel""")
    ),
    QueryDef(
      "basket_repurchase",
      // Repeat-purchase rate per part type — the retention metric on the
      // product axis: of the (customer, part) relationships, how many
      // recur across DISTINCT orders. The fact-fact join shuffles once
      // on o_orderkey (both sides' key), the relationship grain shuffles
      // once on (custkey, partkey); the part-type dim is broadcast.
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        val p = Tables.read(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))
        val rel = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"), col("l_partkey"))
          .agg(countDistinct(col("l_orderkey")).as("n_orders"))
        rel.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_type"))
          .agg(count(lit(1)).as("n_relationships"),
            sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"),
            round(sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).cast("double")
              / count(lit(1)).cast("double"), 4).as("repeat_rate"))
          .orderBy("p_type")
      },
      Some("""
        WITH rel AS (
          SELECT o.o_custkey, l.l_partkey,
                 count(DISTINCT l.l_orderkey) AS n_orders
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          GROUP BY 1, 2)
        SELECT p.p_type,
               count(*) AS n_relationships,
               CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_repeat,
               round(CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS repeat_rate
        FROM rel JOIN part p ON rel.l_partkey = p.p_partkey
        GROUP BY p.p_type ORDER BY p.p_type""")
    ),
    QueryDef(
      "supplier_lead_time",
      // Procurement lead time per supplier: ship lag (l_shipdate −
      // o_orderdate) in integer days, averaged exactly (long day sums,
      // one double division at the projection) plus the max. Fact-fact
      // join on the shared o_orderkey, then one s_suppkey shuffle; the
      // supplier dim stays out entirely — the key is the report grain.
      (s, dir) => {
        val li = Tables.read(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey"),
            datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
              .cast("long").as("lag_d"))
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n_lines"),
            round(sum(col("lag_d")).cast("double")
              / count(lit(1)).cast("double"), 4).as("avg_lag_days"),
            max(col("lag_d")).as("max_lag_days"))
          .orderBy("l_suppkey")
      },
      Some("""
        WITH x AS (
          SELECT l.l_suppkey,
                 CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_d
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT l_suppkey, count(*) AS n_lines,
               round(CAST(sum(lag_d) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
                 AS avg_lag_days,
               max(lag_d) AS max_lag_days
        FROM x GROUP BY l_suppkey ORDER BY l_suppkey""")
    ),
    QueryDef(
      "orders_pareto",
      // Pareto / 80-20 concentration: which customers carry 80% of
      // revenue. Needs a GLOBAL revenue-ordered cumulative sum — the
      // single-partition window trap — so the prefix sum is TWO-PHASE
      // like pack_sequences: range-partition by (rev DESC, custkey),
      // per-partition sums, a tiny cumulative scan over the ≤8 partition
      // totals broadcast back, then per-partition windows. The head
      // predicate compares exact cent-quanta integers ((cum−rev)·10 <
      // total·8 ⇔ share-before < 0.8), never accumulated doubles. The
      // oracle computes the naive single-window cumsum — equality IS the
      // two-phase exactness proof.
      (s, dir) => {
        val rev = Tables.read(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("rev_c"))
        val tot = rev.agg(sum(col("rev_c")).as("total"))
        val parts = rev
          .repartitionByRange(8, col("rev_c").desc, col("o_custkey"))
          .withColumn("pid", spark_partition_id())
        val offsets = parts.groupBy("pid").agg(sum(col("rev_c")).as("psum"))
          .withColumn("offset",
            coalesce(sum(col("psum")).over(
              Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
              lit(0L)))
          .select("pid", "offset")
        parts.join(broadcast(offsets), "pid")
          .withColumn("cum", col("offset") + sum(col("rev_c")).over(
            Window.partitionBy("pid")
              .orderBy(col("rev_c").desc, col("o_custkey"))))
          .crossJoin(broadcast(tot))
          .agg(count(lit(1)).as("n_customers"),
            sum(when((col("cum") - col("rev_c")) * 10 < col("total") * 8, 1L)
              .otherwise(0L)).as("n_head"),
            round(sum(when((col("cum") - col("rev_c")) * 10 < col("total") * 8,
                col("rev_c")).otherwise(0L)).cast("double")
              / max(col("total")).cast("double"), 4).as("head_share"))
      },
      Some("""
        WITH rev AS (
          SELECT o_custkey,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS rev_c
          FROM orders GROUP BY o_custkey),
        tot AS (SELECT CAST(sum(rev_c) AS BIGINT) AS total FROM rev),
        c AS (
          SELECT o_custkey, rev_c,
                 CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM rev)
        SELECT count(*) AS n_customers,
               CAST(sum(CASE WHEN (cum - rev_c) * 10 < total * 8
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_head,
               round(CAST(sum(CASE WHEN (cum - rev_c) * 10 < total * 8
                        THEN rev_c ELSE 0 END) AS DOUBLE)
                 / CAST(max(total) AS DOUBLE), 4) AS head_share
        FROM c, tot""")
    ),
    QueryDef(
      "orders_open_backlog",
      // Open-order backlog per day — interval counting WITHOUT an
      // interval join: each order becomes two deltas (+1 at o_orderdate,
      // −1 at its last ship day), deltas aggregate to day grain (pure
      // map-side-combinable sums), and one running sum over the tiny day
      // spine rebuilds the count of concurrently open orders. The
      // interval-stabbing shape that scales: the fact tables shuffle
      // only on o_orderkey (the close lookup) and day; the global window
      // runs over |days| rows, never over orders.
      (s, dir) => {
        val close = Tables.read(s, dir, "lineitem")
          .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("close_ts"))
        val o = Tables.read(s, dir, "orders")
          .join(close, col("o_orderkey") === col("l_orderkey"))
          .select(to_date(col("o_orderdate")).as("od"),
            to_date(col("close_ts")).as("cd"))
        val deltas = o.select(col("od").as("d"), lit(1L).as("delta"))
          .unionByName(o.select(col("cd").as("d"), lit(-1L).as("delta")))
          .groupBy("d").agg(sum(col("delta")).as("dd"))
        val spine = o.agg(min(col("od")).as("lo"), max(col("cd")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"),
            expr("interval 1 day"))).as("d"))
        spine.join(deltas, Seq("d"), "left")
          .withColumn("open_orders", sum(coalesce(col("dd"), lit(0L))).over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("d"), col("open_orders"))
          .orderBy("d")
      },
      Some("""
        WITH cl AS (
          SELECT l_orderkey, max(l_shipdate) AS close_ts
          FROM lineitem GROUP BY l_orderkey),
        o AS (
          SELECT CAST(o_orderdate AS DATE) AS od, CAST(close_ts AS DATE) AS cd
          FROM orders JOIN cl ON o_orderkey = l_orderkey),
        delta AS (
          SELECT od AS d, 1 AS delta FROM o
          UNION ALL SELECT cd, -1 FROM o),
        agg AS (SELECT d, CAST(sum(delta) AS BIGINT) AS dd FROM delta GROUP BY d),
        b AS (SELECT min(od) AS lo, max(cd) AS hi FROM o),
        days AS (
          SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
          FROM b),
        sp AS (SELECT days.d, coalesce(agg.dd, 0) AS dd
               FROM days LEFT JOIN agg USING (d))
        SELECT d, CAST(sum(dd) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS open_orders
        FROM sp ORDER BY d""")
    )
  )
}
