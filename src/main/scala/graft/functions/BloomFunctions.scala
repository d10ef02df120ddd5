package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

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
        val hashed = new XxHash64(Seq(exprs.head))
        exprs.length match {
          case 1 => new BloomFilterAggregate(hashed)
          case 2 => new BloomFilterAggregate(hashed, exprs(1))
          case _ => new BloomFilterAggregate(hashed, exprs(1), exprs(2))
        }
      },
      "built-in"
    )

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
      exprs => BloomFilterMightContain(Literal(serialized), new XxHash64(Seq(exprs.head))),
      "built-in"
    )
}
