package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native banded sign-random-projection signature over an `array<float>`
  * embedding: `bands × bitsPerBand` deterministic ±1 hyperplanes; each
  * band's sign bits pack into one BIGINT, returned as `array<long>` of
  * length `bands`.
  *
  * This is SimHash for vectors, banded the way MinHash-LSH bands its
  * signature: two vectors are LSH candidates iff they agree on EVERY bit of
  * SOME band, so candidate generation is an equi-join on `(band, value)` —
  * the keyspace per band is `2^bitsPerBand` and total bucket cardinality
  * grows multiplicatively with `bands`, not fixed at one small constant.
  *
  * Recall math (for tuning, P(bit match) = 1 − arccos(cos θ)/π):
  * a pair at cosine c collides in one band with `p^bitsPerBand`, overall
  * `1 − (1 − p^bits)^bands`. High-similarity near-dup mining (c ≥ 0.9,
  * p ≥ 0.86) wants 16-bit bands (16 bands → ~74% recall, narrow buckets);
  * low-threshold regimes need coarser bands (8-bit) or IVF routing instead
  * — LSH buckets at low thresholds are inherently population-heavy.
  *
  * Hyperplane weights derive from `xxhash64(SEED, bit, dim)` so signatures
  * are deterministic across partitions, sessions and cluster sizes; the
  * ±1 weight table is materialized once per (expression, dimensionality)
  * and reused for every row — the hot loop is a pure JVM sum, no hashing.
  */
case class SrpBands(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  require(bands > 0 && bitsPerBand > 0 && bitsPerBand <= 64,
    s"srp_bands needs bands > 0 and 0 < bitsPerBand <= 64, got ($bands, $bitsPerBand)")

  private val SEED = 42L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bands expects array<float>, got ${other.simpleString}")
  }

  // ±1 weight per (global bit, dim), built lazily at the first row because
  // the vector dimensionality is only known then; rebuilt if dim changes.
  @transient private var weights: Array[Byte] = _
  @transient private var weightsDim: Int = -1

  private def weightTable(dim: Int): Array[Byte] = {
    if (weights == null || weightsDim != dim) {
      val total = bands * bitsPerBand
      val w = new Array[Byte](total * dim)
      var g = 0
      while (g < total) {
        val rowSeed = XXH64.hashInt(g, SEED)
        var i = 0
        while (i < dim) {
          w(g * dim + i) = if (((XXH64.hashInt(i, rowSeed) >>> 1) & 1L) == 1L) 1 else -1
          i += 1
        }
        g += 1
      }
      weights = w
      weightsDim = dim
    }
    weights
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val w = weightTable(dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var packed = 0L
      var r = 0
      while (r < bitsPerBand) {
        val g = b * bitsPerBand + r
        var s = 0.0
        var i = 0
        val base = g * dim
        while (i < dim) {
          s += v.getFloat(i).toDouble * w(base + i)
          i += 1
        }
        if (s > 0.0) packed |= 1L << r
        r += 1
      }
      out(b) = packed
      b += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "srp_bands"

  override protected def withNewChildInternal(newChild: Expression): SrpBands =
    copy(child = newChild)
}

object SrpBands {
  /** Idempotently register `srp_bands(vec, bands, bitsPerBand)` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "srp_bands",
      exprs => SrpBands(
        exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "built-in"
    )
}
