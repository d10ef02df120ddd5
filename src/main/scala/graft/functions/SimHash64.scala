package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash over an `array<string>` token set: hash each
  * token, then for each bit position take the sign of the ±1-weighted sum.
  *
  * The per-token hash is the LOWER 64 BITS of the token's MD5 digest
  * (bytes 8–15, little-endian) — exactly DuckDB's `md5_number_lower`, so
  * the whole signature (and therefore the banded Hamming-pair output) is
  * replayable as an exact SQL oracle in a second engine. An xxhash64
  * token hash would be ~2× faster map-side and is a one-line swap here,
  * but it is not computable by the oracle engine; signature quality is
  * equivalent (both are well-mixed 64-bit hashes). Bit-identity with the
  * SQL HoF composition over `md5(t)` hex is asserted by FunctionsSpec.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new Array[Int](64)
    val md = SimHash64.digests.get()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      md.reset()
      val d = md.digest(t.getBytes)
      // digest bytes 8..15 little-endian == DuckDB md5_number_lower
      var h = 0L
      var j = 7
      while (j >= 0) { h = (h << 8) | (d(8 + j) & 0xffL); j -= 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** One MD5 instance per executor thread — digest() is stateful. */
  private[functions] val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
}
