package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time every catalog query individually (sorted report) to
  * spot stragglers before the driver's bench run.
  */
object TimeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timeall] $name%-28s $sec%8.2fs  rows=$n")
      name -> sec
    }
    println(f"[timeall] TOTAL ${times.map(_._2).sum}%.1fs")
    spark.stop()
  }
}
