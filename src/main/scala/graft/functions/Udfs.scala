package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The user-extension surface (SURVEY.md §2.2 "UDF surface"):
  *
  *   - scalar UDF ([[slugify]]) — the escape hatch; prefer built-in
  *     `Column` expressions (codegen + pushdown survive) and treat a Scala
  *     UDF as the last resort before a native Catalyst expression;
  *   - typed UDAF ([[GeometricMean]]) — `Aggregator[IN, BUF, OUT]`, the
  *     public API for custom aggregation with partial (map-side) merge —
  *     scales like any built-in agg because `merge` is associative;
  *   - UDTF shape ([[explodeTokens]]) — Spark's row-generating form is an
  *     array-returning expression + `explode`/`posexplode`, not a separate
  *     function class.
  */
object Udfs {

  /** Scalar UDF: URL-slug a string. Deliberately simple and total. */
  val slugifyFn: String => String = s =>
    s.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("^-|-$", "")

  val slugify = udf(slugifyFn)

  /** Geometric mean as a typed Aggregator: buffer = (Σ ln x, n); both
    * `reduce` and `merge` are associative+commutative, so Spark computes
    * partial aggregates map-side and merges after the shuffle — the same
    * execution shape as a built-in aggregate.
    */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val geometricMean = udaf(GeometricMean)

  /** UDTF shape: one row per (position, token) of a text column. */
  def explodeTokens(text: Column): Column =
    posexplode(filter(split(lower(text), "\\s+"), t => t =!= ""))
}
