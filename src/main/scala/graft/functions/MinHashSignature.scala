package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over an `array<string>` token set: each token
  * is byte-hashed ONCE (`h_t = xxhash64(t)`), then the k signature lanes
  * take the minimum of the seeded long-mix `xxhash64(j, h_t)` — the
  * standard double-hash construction, BIT-IDENTICAL to the SQL composition
  * `transform(sequence(0,k-1), j -> array_min(transform(toks, t -> xxhash64(j, xxhash64(t)))))`
  * (asserted by spec), but computed in one tight loop.
  *
  * Why it exists: Spark's higher-order functions evaluate their lambdas on
  * the interpreted path, so the nested-transform form pays per-element
  * Catalyst eval overhead for k×|toks| hash calls. This expression is
  * CodegenFallback too, but its inner loop is plain JVM code, and the
  * variable-length byte hashing is amortized to once per token — the k
  * inner iterations are fixed 8-byte `hashLong` mixes, which is what keeps
  * the map side flat as the auto-fit widens k (64 → 176 lanes).
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  // xxhash64's default seed (org.apache.spark.sql.catalyst.expressions.XxHash64)
  private val SEED = 42L

  // per-lane seeds: XxHash64's fold of the leading int argument j
  @transient private lazy val laneSeeds: Array[Long] =
    Array.tabulate(k)(j => XXH64.hashInt(j, SEED))

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    // HoF-form parity: array_min over an empty array is null per element
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val ht = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes(), SEED)
      var j = 0
      while (j < k) {
        val h = XXH64.hashLong(ht, laneSeeds(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Idempotently register `minhash_sig(arr, k)` for SQL/`expr` use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSignature(
        exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in"
    )
}
