package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: intersection size of two SORTED
  * `array<bigint>` token-rank-id arrays by linear merge — the hot inner loop of
  * exact similarity verification (PPJoin verify, containment argmax).
  *
  * `array_intersect` + `size` builds a hash set of one side and a result
  * ARRAY per row; on the mining verify path that is millions of candidate
  * pairs × hundreds of string tokens of hashing and allocation, and it
  * dominated the whole miner (~300 core-seconds at sf0.1). Token sets in
  * the mining index are already sorted by the global rarity rank
  * (see [[graft.ops.DedupOps.reps]]'s `rks` column), so the count is one
  * allocation-free integer-compare merge: ~30× less CPU in the verify stage
  * and fully inside whole-stage codegen.
  *
  * PRECONDITION: both inputs sorted ascending with distinct elements (the
  * index guarantees both — token sets are distinct by construction and the
  * rank is a bijection). Unsorted input silently undercounts; this
  * expression is private plumbing for the mining index, not a general SQL
  * surface.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $na = $a.numElements();
        int $nb = $b.numElements();
        int $i = 0, $j = 0, $c = 0;
        while ($i < $na && $j < $nb) {
          long $x = $a.getLong($i);
          long $y = $b.getLong($j);
          if ($x == $y) { $c++; $i++; $j++; }
          else if ($x < $y) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Idempotently register `sorted_intersect_count` for SQL/`expr` use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs.head, exprs(1)),
      "built-in"
    )
}
