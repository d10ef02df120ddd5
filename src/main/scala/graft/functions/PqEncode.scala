package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization encoder: L2-normalize the input vector and,
  * for each of the `m` subspaces, emit the index of the nearest codebook
  * centroid (L2², first minimum wins) — the per-vector encode step of
  * [[graft.ops.SimilarityOps.pqTopK]].
  *
  * BIT-IDENTICAL to the higher-order-function composition it replaces
  * (same operation order: ascending-index squared-norm accumulation, per
  * dimension `(x/‖v‖ − c)²` added left to right, strict `<` argmin), which
  * PqEncodeSpec asserts on the real embeddings table. Why it exists: HoF
  * lambdas evaluate on the interpreted path, so the nested
  * transform/aggregate form pays Catalyst eval overhead for each of the
  * m·ksub·(d/m) fused multiply-adds per row; this loop is plain JVM code —
  * the same reasoning (and speedup class) as [[MinHashSignature]].
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  private val m = codebooks.length
  private val ksub = codebooks.head.length
  private val dsub = codebooks.head.head.length
  // flattened [s][c][i] -> s*ksub*dsub + c*dsub + i for cache-friendly eval
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * ksub * dsub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var i = 0
        while (i < dsub) {
          a(s * ksub * dsub + c * dsub + i) = codebooks(s)(c)(i)
          i += 1
        }
        c += 1
      }
      s += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.simpleString}")
  }

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val d = m * dsub
    val v = new Array[Double](d)
    var i = 0
    while (i < d) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    // same fold order as the HoF form: ascending-index sum of squares.
    // Zero-norm guard (shared convention with pqCodesHof/pqTopK): clamp to
    // the smallest positive double so an all-zeros vector normalizes to
    // all zeros (0/4.9e-324 = 0) instead of NaN — NaN distances would pin
    // bestC at -1 and crash the downstream 1-based ADC element_at.
    var ss = 0.0
    i = 0
    while (i < d) { ss += v(i) * v(i); i += 1 }
    val norm = math.max(math.sqrt(ss), Double.MinPositiveValue)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var bestC = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var dist = 0.0
        var j = 0
        val base = s * ksub * dsub + c * dsub
        while (j < dsub) {
          val diff = v(s * dsub + j) / norm - flat(base + j)
          dist += diff * diff
          j += 1
        }
        if (dist < bestD) { bestD = dist; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def prettyName: String = "pq_encode"

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  private val counter = new AtomicLong(0L)

  /** Register the encoder for THIS codebook under a fresh unique name and
    * return the name — the codebook rides in the registration closure (the
    * same pattern as [[BloomFunctions.registerProbeUnique]]; a fixed name
    * would cross-wire two concurrent searches' codebooks).
    */
  def registerUnique(
      spark: org.apache.spark.sql.SparkSession,
      codebooks: Seq[Seq[Seq[Double]]]): String = {
    val name = s"graft_pq_encode_${counter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"$name expects exactly 1 argument (the vector column), got ${exprs.length}")
        PqEncode(exprs.head, codebooks)
      },
      "built-in"
    )
    name
  }
}
