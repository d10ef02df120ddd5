package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shipped examples must RUN, not just compile: the README quickstart
  * snippet is [[Quickstart.curate]] verbatim, so this spec is the fence
  * that keeps the documented developer surface executable.
  */
class ExamplesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
    .master("local[4]")
    .appName("graft-examples-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("README quickstart curates, mixes, shards, and traces end-to-end") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_quickstart_spec"
    val trace = Quickstart.curate(spark, dir, out)
    // the summary reads the sink back: shards exist and hold rows
    val summary = trace.result.collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(summary.nonEmpty && summary.forall(_._2 > 0))
    assert(summary.map(_._1).toSet.subsetOf((0 until 8).toSet))
    // the sharded layout really is hash-partitioned on disk
    val laid = spark.read.parquet(out)
    assert(laid.filter(col("shard") =!=
      pmod(xxhash64(col("doc_id")), lit(8)).cast("int")).count() == 0)
    // dedup ran and counted; mixture kept every surviving source bounded
    // by the smallest one (uniform target, integer thresholds)
    assert(trace.counterTotals.contains("near_dup_docs_dropped"))
    // hash keying end to end: a re-run is bit-identical (no rand() anywhere)
    val again = Quickstart.curate(spark, dir, out)
      .result.collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(again.sameElements(summary), "quickstart is not deterministic")
    assert(trace.result.columns.sameElements(Array("shard", "n_docs")))
  }
}
