package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenizer + dedup: BIT-IDENTICAL to the SQL
  * composition `array_distinct(filter(split(lower(text), '\\s+'), t -> t <> ''))`
  * (asserted by spec) — lowercase, split on runs of Java-regex `\s`
  * whitespace, drop empties, keep first occurrence order — in one pass
  * over the string instead of a regex engine + three array expressions.
  *
  * This is the map-side entry of every text-mining operator (PPJoin
  * index, MinHash, language ID), so the per-document constant matters at
  * corpus scale.
  */
case class DistinctTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_distinct_tokens expects string, got ${other.simpleString}")
  }

  // Java regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    // lower() first on the whole string — UTF8String.toLowerCase is
    // locale-independent, matching Spark's Lower expression.
    val s = input.asInstanceOf[UTF8String].toLowerCase.toString
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) seen.add(s.substring(start, i))
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override def prettyName: String = "ws_distinct_tokens"

  override protected def withNewChildInternal(newChild: Expression): DistinctTokens =
    copy(child = newChild)
}

object DistinctTokens {
  /** Idempotently register `ws_distinct_tokens(text)` for SQL/`expr` use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ws_distinct_tokens",
      exprs => DistinctTokens(exprs.head),
      "built-in"
    )
}
