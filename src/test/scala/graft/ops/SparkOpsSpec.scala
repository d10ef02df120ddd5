package graft.ops

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the prebuilt DataFrame nodes: DQ gates, observability,
  * multi-source extract, fan-out load through the algebra.
  */
class SparkOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sparkops-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  test("ensureRows passes a holding invariant and fails a violated one") {
    val s = spark
    import s.implicits._
    val df = Seq(1, 2, 3).toDF("v")
    val ok = SparkOps.ensureRows(col("v") > 0, "v positive")
    assert(ok.unsafeRun(df).count() == 3)
    val bad = SparkOps.ensureRows(col("v") > 2, "v > 2")
    val ex = intercept[ValidationException](bad.unsafeRun(df))
    assert(ex.getMessage.contains("v > 2"))
  }

  test("countTo records the row count into the Trace as a counter") {
    val s = spark
    import s.implicits._
    val df = Seq(1, 2, 3, 4).toDF("v")
    val pipeline = Node[Unit, org.apache.spark.sql.DataFrame](_ => df) ~>
      SparkOps.countTo("rows_seen")
    val trace = pipeline.unsafeRunTrace(())
    assert(trace.counterTotals == Map("rows_seen" -> 4L))
  }

  test("scanTables reads a named map of tables in one extract node") {
    val env = SparkEnv(spark, dir)
    val tables = SparkOps.scanTables("region", "nation").provide(env).unsafeRun(())
    assert(tables.keySet == Set("region", "nation"))
    assert(tables("region").count() == 5)
    assert(tables("nation").count() == 25)
  }

  test("fan-out load: one source, two sinks via & then >>") {
    val env = SparkEnv(spark, dir)
    val tmpA = s"${System.getProperty("java.io.tmpdir")}/graft_fan_a"
    val tmpB = s"${System.getProperty("java.io.tmpdir")}/graft_fan_b"
    val pipeline = SparkOps.scanParquet("region") ~>
      (SparkOps.writeParquet(tmpA) & SparkOps.writeParquet(tmpB))
    pipeline.provide(env).unsafeRun(())
    assert(spark.read.parquet(tmpA).count() == 5)
    assert(spark.read.parquet(tmpB).count() == 5)
  }

  test("join node composes over a fan-out of two scans") {
    val env = SparkEnv(spark, dir)
    val pipeline =
      (SparkOps.scanParquet("nation") & SparkOps.scanParquet("region")) ~>
        SparkOps.joinOn((l, r) => l("n_regionkey") === r("r_regionkey"),
          broadcastRight = true)
    val joined = pipeline.provide(env).unsafeRun(())
    assert(joined.count() == 25)
    assert(joined.columns.contains("r_name"))
  }
}
