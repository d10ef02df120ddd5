package tmpverify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, SparkOps}
import graft.ops.SparkOps.Materialize

/** A/B old wedge-semi-join vs new sorted-intersection triangle census
  * over the real mining graph at sf0.1.
  */
object Drive extends App {
  val dir = "/root/testdata/sf0.1"
  val spark = SparkSession.builder()
    .master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  spark.range(1000000).selectExpr("sum(id) s").collect()

  def docs(s: SparkSession): DataFrame =
    graft.queries.Tables.read(s, dir, "documents")

  // prime the pair mine once (both shapes read the cached τ=0.95 pairs)
  val e = DedupOps.ngramJaccardCachedUnsorted(docs(spark), threshold = 0.95)
    .select(col("id_a").as("a"), col("id_b").as("b"))
  e.count()

  def orientedOf(raw: DataFrame): DataFrame = {
    val deg = raw.select(col("a").as("v"))
      .unionByName(raw.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val withDeg = raw
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
      .materialized
  }

  def oldCensus(): DataFrame = {
    val oriented = orientedOf(e)
    val o1 = oriented.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
    val o2 = oriented.select(col("src"), col("dst").as("w"), col("ddeg").as("dw"))
    val wedges = o1.join(o2, Seq("src"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v"), col("w"))
    wedges
      .join(oriented.select(col("src").as("v"), col("dst").as("w")),
        Seq("v", "w"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  def newCensus(): DataFrame =
    graft.ops.GraphOps.triangleCountOriented(e, assumeCanonical = true)

  def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
  println("old count=" + oldCensus().head.getLong(0) +
    " new count=" + newCensus().head.getLong(0))
  val olds = collection.mutable.ArrayBuffer[Double]()
  val news = collection.mutable.ArrayBuffer[Double]()
  for (_ <- 1 to 5) {
    olds += time(oldCensus().count())
    news += time(newCensus().count())
  }
  println(f"[ab] graph_triangles old=${med(olds.toSeq)}%.2f (${olds.map(x=>f"$x%.2f").mkString(" ")})  new=${med(news.toSeq)}%.2f (${news.map(x=>f"$x%.2f").mkString(" ")})")
  spark.stop()
}
