package graft.functions

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType

/** Native Bloom-filter build + probe for explicit runtime-filter joins —
  * the same Catalyst expressions Spark's own `InjectRuntimeFilter` plants
  * (build: `BloomFilterAggregate` over `xxhash64(key)`, a mergeable sketch
  * aggregated distributed with only the final bitset leaving the
  * executors; probe: `BloomFilterMightContain`, which participates in
  * codegen). This replaces the closure-UDF probe, which evaluated
  * interpreted per row and broke the whole-stage-codegen span at the scan.
  */
object BloomFunctions {

  /** Register `graft_bloom_agg(key[, expectedItems[, numBits]])` — builds
    * a serialized Bloom filter over `xxhash64(key)` values (the hashing
    * matches what [[probe]] applies on the other side).
    */
  def registerAgg(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => {
        if (exprs.isEmpty || exprs.length > 3)
          throw new IllegalArgumentException(
            s"graft_bloom_agg expects 1 to 3 arguments (key[, expectedItems[, numBits]]), got ${exprs.length}")
        val hashed = new XxHash64(Seq(exprs.head))
        // BloomFilterAggregate requires BIGINT for expectedItems/numBits;
        // SQL integer literals parse as INT, so cast explicitly.
        val sized = exprs.drop(1).map(e => Cast(e, LongType))
        sized match {
          case Seq()            => new BloomFilterAggregate(hashed)
          case Seq(items)       => new BloomFilterAggregate(hashed, items)
          case Seq(items, bits) => new BloomFilterAggregate(hashed, items, bits)
        }
      },
      "built-in"
    )

  private val probeCounter = new AtomicLong(0L)

  /** Register `<name>(key)` probing the given serialized filter: the
    * sketch bytes are embedded as a foldable binary literal (the driver
    * already holds them after the build action — same footprint as
    * `df.stat.bloomFilter`), so `BloomFilterMightContain` passes its
    * constant-filter requirement and the probe compiles into the scan's
    * codegen stage.
    */
  def registerProbe(spark: SparkSession, name: String, serialized: Array[Byte]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"$name expects exactly 1 argument (the probe key), got ${exprs.length}")
        BloomFilterMightContain(Literal(serialized), new XxHash64(Seq(exprs.head)))
      },
      "built-in"
    )

  /** Register a probe under a fresh unique name and return it. A fixed name
    * lets two concurrent builds on the same session cross-wire their filter
    * bytes — and because the probe is a pre-filter before the exact join, a
    * wrong filter silently drops true rows. The counter suffix makes each
    * registration independent.
    */
  def registerProbeUnique(spark: SparkSession, serialized: Array[Byte]): String = {
    val name = s"graft_bloom_probe_${probeCounter.incrementAndGet()}"
    registerProbe(spark, name, serialized)
    name
  }
}
