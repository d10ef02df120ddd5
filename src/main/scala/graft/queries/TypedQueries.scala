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
        val ds = s.read.parquet(s"$dir/lineitem.parquet")
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
    )
  )
}
