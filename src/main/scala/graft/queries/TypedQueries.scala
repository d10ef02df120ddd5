package graft.queries

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset[T] row for the case-class-Encoder surface. */
final case class LineItemLite(
    l_suppkey: Long,
    l_returnflag: String,
    l_quantity: Double,
    l_extendedprice: Double)

final case class OrderLite(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
final case class CustomerLite(c_custkey: Long, c_mktsegment: String)

/** Mergeable typed aggregators — Aggregator[IN, BUF, OUT] gets partial
  * (map-side) aggregation from Catalyst, unlike mapGroups which shuffles
  * every row. BUFs are associative, so partition order cannot change
  * results (money quantized to long cents-e2 per row).
  */
object TypedAggs {
  val countAgg: Aggregator[LineItemLite, Long, Long] =
    new Aggregator[LineItemLite, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: LineItemLite): Long = b + 1
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Exact long-quantized price sum (quanta = floor(x*10000 + 0.5)). */
  val priceQuanta: Aggregator[LineItemLite, Long, Long] =
    new Aggregator[LineItemLite, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: LineItemLite): Long =
        b + math.floor(a.l_extendedprice * 10000 + 0.5).toLong
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}

/** Typed-Dataset and collection-type queries: the Dataset[T] surface with
  * case-class Encoders + typed Aggregators, and MapType handling.
  */
object TypedQueries {

  def queries: Seq[QueryDef] = Seq(
    QueryDef(
      "typed_dataset_agg",
      (s, dir) => {
        import s.implicits._
        // Compile-time-typed pipeline: Dataset[LineItemLite] -> typed
        // filter -> groupByKey -> two mergeable Aggregators. The lambda
        // filter costs deserialization (documented tradeoff of the typed
        // surface); the aggregation itself partial-aggregates exactly like
        // the untyped plan.
        val ds = Tables.read(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_returnflag"),
            col("l_quantity"), col("l_extendedprice"))
          .as[LineItemLite]
        ds.filter((li: LineItemLite) => li.l_quantity > 25.0)
          .groupByKey((li: LineItemLite) => li.l_returnflag)
          .agg(TypedAggs.countAgg.toColumn.name("n"),
            TypedAggs.priceQuanta.toColumn.name("q"))
          .toDF("l_returnflag", "n", "price_quanta")
          .select(col("l_returnflag"), col("n"),
            (floor((col("price_quanta") + 50) / 100) / 100.0).as("total_price"))
          .orderBy("l_returnflag")
      },
      Some("""
        SELECT l_returnflag, count(*) AS n,
               floor((sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total_price
        FROM lineitem WHERE l_quantity > 25.0
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    ),
    QueryDef(
      "typed_joinwith",
      // Dataset.joinWith: the typed pair join — each side keeps its
      // case-class identity through the join (Dataset[(OrderLite,
      // CustomerLite)]), the segment dim broadcasts exactly like the
      // untyped plan, and the money math quantizes per row inside the
      // typed lambda before the (untyped, partial-aggregating) rollup.
      (s, dir) => {
        import s.implicits._
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .as[OrderLite]
        val c = Tables.read(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
          .as[CustomerLite]
        o.joinWith(broadcast(c), col("o_custkey") === col("c_custkey"))
          .map { case (ord, cust) =>
            (cust.c_mktsegment,
              math.floor(ord.o_totalprice * 10000 + 0.5).toLong)
          }
          .toDF("c_mktsegment", "q")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            (floor((sum(col("q")) + 50) / 100) / 100.0).as("total_price"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n,
               floor((sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY c_mktsegment""")
    ),
    QueryDef(
      "typed_reducegroups",
      // groupByKey + reduceGroups: the typed associative reduction.
      // Catalyst wraps the reduce function in a ReduceAggregator, so it
      // DOES partial-aggregate map-side (unlike mapGroups, which ships
      // every row) — the accumulator is an associative+commutative
      // (count, long-quanta) pair, so batching and partition order cannot
      // change the result.
      (s, dir) => {
        import s.implicits._
        val ds = Tables.read(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_returnflag"),
            col("l_quantity"), col("l_extendedprice"))
          .as[LineItemLite]
        ds.map(li => (li.l_suppkey, 1L,
            math.floor(li.l_extendedprice * 10000 + 0.5).toLong))
          .groupByKey(_._1)
          .reduceGroups((a, b) => (a._1, a._2 + b._2, a._3 + b._3))
          .map(_._2)
          .toDF("l_suppkey", "n", "q")
          .select(col("l_suppkey"), col("n"),
            (floor((col("q") + 50) / 100) / 100.0).as("total_price"))
          .orderBy("l_suppkey")
      },
      Some("""
        SELECT l_suppkey, count(*) AS n,
               floor((sum(CAST(floor(l_extendedprice * 10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0 AS total_price
        FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""")
    ),
    QueryDef(
      "map_funcs",
      (s, dir) => {
        // MapType surface: parse events.props into map<string,bigint>,
        // then per-row map functions (keys, size, lookup). Pure
        // expressions over the scan — no shuffle.
        val e = Tables.events(s, dir)
        e.select(col("event_id"),
            from_json(col("props"),
              org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("m"))
          .select(col("event_id"),
            size(col("m")).as("n_keys"),
            concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
            element_at(col("m"), "k").as("k_value"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id,
               CAST(len(json_keys(props)) AS INT) AS n_keys,
               array_to_string(list_sort(json_keys(props)), ',') AS keys,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
        FROM events ORDER BY event_id""")
    ),
    QueryDef(
      "typed_cogroup",
      // KeyValueGroupedDataset.cogroup: the typed groupwise MERGE of two
      // datasets — both sides shuffle once on the key and arrive as
      // co-partitioned iterators, so per-key logic (here: customers with
      // their possibly-empty order group, i.e. a left-groupwise join that
      // keeps order-less customers) runs in one pass with no join
      // explosion and no second shuffle. Money quantizes to long inside
      // the lambda; the rollup after is plain partial-aggregating SQL.
      (s, dir) => {
        import s.implicits._
        val c = Tables.read(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
          .as[CustomerLite]
          .groupByKey(_.c_custkey)
        val o = Tables.read(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .as[OrderLite]
          .groupByKey(_.o_custkey)
        c.cogroup(o) { (_, cs, os) =>
          // Fold the order side ONCE per key, before iterating customers —
          // os is a one-shot iterator, so only a pre-folded (n, q) can be
          // attributed to every customer row in cs, not only the first.
          // PRECONDITION: c_custkey is unique (the TPC-H PK). If it were
          // duplicated, cogroup emits one row PER duplicate each carrying
          // the full per-key order stats, while the oracle's
          // GROUP BY c_custkey collapses the duplicates into one group
          // that counts each order once per duplicate — the two shapes
          // diverge. Reusing this pattern on a non-PK key needs a
          // distinct-on-key pass (or oracle rewrite) first.
          var n = 0L
          var q = 0L
          os.foreach { ord =>
            n += 1
            q += math.floor(ord.o_totalprice * 10000 + 0.5).toLong
          }
          cs.map(cust => (cust.c_mktsegment, n, q))
        }
          .toDF("c_mktsegment", "n", "q")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_customers"),
            sum(col("n")).as("n_orders"),
            (floor((sum(col("q")) + 50) / 100) / 100.0).as("total_price"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH per_c AS (
          SELECT c.c_custkey, c.c_mktsegment, count(o.o_orderkey) AS n,
                 COALESCE(sum(CAST(floor(o.o_totalprice * 10000 + 0.5) AS BIGINT)), 0) AS q
          FROM customer c LEFT JOIN orders o ON o_custkey = c_custkey
          GROUP BY 1, 2)
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(sum(n) AS BIGINT) AS n_orders,
               floor((sum(q) + 50) / 100) / 100.0 AS total_price
        FROM per_c GROUP BY 1 ORDER BY c_mktsegment""")
    )
  )
}
