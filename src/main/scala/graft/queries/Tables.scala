package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table readers for the test dataset. */
object Tables {

  def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Order-independent, engine-independent money aggregate, rounded to
    * cents. Doubles are quantized per row with `floor(x*10000 + 0.5)` (the
    * same IEEE ops in any engine — immune to rounding-mode differences that
    * `round()` and double→decimal casts have at ties), summed exactly as
    * longs (associative, so partition order can't change the result), then
    * integer-rounded to cents. Headroom: |sum| < 2^53/1e4 ≈ 9e11 dollars —
    * use DECIMAL(38,0) accumulation beyond that.
    *
    * DuckDB oracle mirror:
    * `floor((sum(CAST(floor(x*10000 + 0.5) AS BIGINT)) + 50) / 100) / 100.0`
    */
  def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val quanta = floor(c * 10000 + 0.5).cast("long")
    floor((sum(quanta) + 50) / 100) / 100.0
  }

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark 4 rejects
    * outright; read nanos as long and rebuild a (microsecond) timestamp.
    * Sub-microsecond precision is dropped — irrelevant for window/date
    * bucketing, and the oracle comparisons never emit a raw `ts`.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
