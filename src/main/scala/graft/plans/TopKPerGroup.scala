package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k: the first `k` rows of each group under `order` — an
  * operator Spark's DataFrame API lacks as a primitive (the idiomatic
  * `Window.partitionBy.orderBy` + `row_number <= k` SORTS every partition
  * in full).
  *
  * Physical shape (planned by [[TopKStrategy]]):
  * {{{
  *   FinalTopKExec (per-group bounded heaps, after hash shuffle on keys)
  *     +- Exchange hashpartitioning(groupBy)   // inserted by Spark
  *        +- PartialTopKExec (per-group bounded heaps, map-side)
  * }}}
  * The partial stage caps shuffle input at k rows per (group, partition) —
  * at 1000 executors the shuffle carries O(groups × k × partitions-hit)
  * rows instead of the full table, and nothing is ever globally sorted.
  */
case class TopKPerGroup(
    k: Int,
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan
) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {

  /** Column-name front door: `topK(df, 3, Seq("brand"), Seq("price" -> true))`
    * keeps the 3 rows with highest price per brand (`desc = true`).
    */
  def apply(
      df: DataFrame,
      k: Int,
      groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)]
  ): DataFrame = {
    val spark = df.sparkSession
    GraftSqlBridge.installStrategy(spark, TopKStrategy)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name)}"))
    val order = orderCols.map { case (c, desc) =>
      SortOrder(attr(c), if (desc) Descending else Ascending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerGroup(k, groupCols.map(attr), order, analyzed))
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, groupBy, order, child) =>
      FinalTopKExec(k, groupBy, order,
        PartialTopKExec(k, groupBy, order, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared per-group bounded-heap pass. */
trait TopKLike extends UnaryExecNode {
  def k: Int
  def groupBy: Seq[Expression]
  def order: Seq[SortOrder]

  override def output: Seq[Attribute] = child.output

  protected def boundedTopK(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupBy, child.output)
    // max-heap under the requested order: head = current worst kept row
    val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(order, child.output)
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val heap = heaps.getOrElseUpdate(
        keyProj(row).copy(), mutable.PriorityQueue.empty(ord))
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ord.lt(row, heap.head)) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side partial: bounds every partition's contribution to k per group
  * before the shuffle.
  */
case class PartialTopKExec(
    k: Int,
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan
) extends TopKLike {
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(boundedTopK)
  override protected def withNewChildInternal(c: SparkPlan): PartialTopKExec =
    copy(child = c)
}

/** Reduce-side final: requires clustering on the group keys (Spark inserts
  * the hash exchange), then keeps the true top-k per group.
  */
case class FinalTopKExec(
    k: Int,
    groupBy: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan
) extends TopKLike {
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupBy) :: Nil
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(boundedTopK)
  override protected def withNewChildInternal(c: SparkPlan): FinalTopKExec =
    copy(child = c)
}
