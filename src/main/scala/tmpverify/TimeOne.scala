package tmpverify

import org.apache.spark.sql.SparkSession

/** Scratch: bench-style timing of named registered queries. */
object TimeOne extends App {
  val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
  val names = args.drop(1)
  val spark = SparkSession.builder()
    .master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  try {
    spark.range(1000000).selectExpr("sum(id) s").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
  } catch { case _: Throwable => () }
  names.foreach { name =>
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
  }
  spark.stop()
}
