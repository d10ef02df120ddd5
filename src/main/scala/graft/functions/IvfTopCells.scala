package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native IVF cell router: the ids of the `r` coarse-quantizer cells with
  * the highest dot product against the input vector (centroids are unit
  * vectors, so dot ranking IS cosine ranking; ties resolve to the lowest
  * cell id — the same `(−dot, cid)` ascending order as the
  * `transform`/`array_sort`/`slice` composition it replaces in
  * [[graft.ops.SimilarityOps.ivfTopK]]).
  *
  * Why native: the HoF form evaluates nc·d interpreted lambda calls per
  * row (every cell's `zip_with`+`aggregate`); this is one tight JVM loop
  * over the flattened codebook — the same reasoning and speedup class as
  * [[PqEncode]] and [[MinHashSignature]]. At index-build scale (every
  * corpus vector routes through this once) the difference is the whole
  * assignment stage's CPU.
  */
case class IvfTopCells(child: Expression, centroids: Seq[Seq[Double]], r: Int)
    extends UnaryExpression with CodegenFallback {

  private val nc = centroids.length
  private val d = centroids.head.length
  // flattened [c][i] -> c*d + i for cache-friendly eval
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](nc * d)
    var c = 0
    while (c < nc) {
      var i = 0
      while (i < d) { a(c * d + i) = centroids(c)(i); i += 1 }
      c += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_top_cells expects array<float|double>, got ${other.simpleString}")
  }

  private val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), d)
    val dots = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      var dot = 0.0
      var i = 0
      val base = c * d
      // ascending-index accumulation — same fold order as the HoF form
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * flat(base + i)
        i += 1
      }
      dots(c) = dot
      c += 1
    }
    val k = math.min(r, nc)
    val out = new Array[Long](k)
    val used = new Array[Boolean](nc)
    var j = 0
    while (j < k) {
      var best = -1
      var bestD = Double.NegativeInfinity
      var c2 = 0
      while (c2 < nc) {
        // strict > keeps the FIRST (lowest cid) on ties — matches the
        // (−dot, cid) ascending struct sort
        if (!used(c2) && dots(c2) > bestD) { bestD = dots(c2); best = c2 }
        c2 += 1
      }
      used(best) = true
      out(j) = best.toLong
      j += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "ivf_top_cells"

  override protected def withNewChildInternal(newChild: Expression): IvfTopCells =
    copy(child = newChild)
}

object IvfTopCells {
  private val counter = new AtomicLong(0L)

  /** Register a router for THIS codebook under a fresh unique name
    * `name(vector, r)` and return the name — codebook in the registration
    * closure, same anti-cross-wiring pattern as [[PqEncode.registerUnique]].
    */
  def registerUnique(
      spark: org.apache.spark.sql.SparkSession,
      centroids: Seq[Seq[Double]]): String = {
    val name = s"graft_ivf_cells_${counter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"$name expects (vector, r), got ${exprs.length} arguments")
        val r = exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"$name: r must be an integer literal, got $other")
        }
        IvfTopCells(exprs.head, centroids, r)
      },
      "built-in"
    )
    name
  }
}
