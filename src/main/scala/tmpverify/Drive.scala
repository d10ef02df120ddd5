package tmpverify
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Drive extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  spark.range(1000000).selectExpr("sum(id)").collect()
  val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  docs.count()
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[drive] $label ${(System.nanoTime()-t0)/1e9}%.2fs"); r
  }
  val ts = graft.ops.DedupOps.tokenSets(docs).persist()
  time("tokenSets (split+distinct)")(ts.count())
  val toks = ts.select(col("doc_id"), explode(col("toks")).as("tok")).persist()
  time("explode")(toks.count())
  val df_ = toks.groupBy("tok").agg(count(lit(1)).as("df"))
  time("docFreq")(df_.count())
  val joined = toks.join(df_, "tok")
  val sorted = joined.groupBy("doc_id")
    .agg(expr("transform(array_sort(collect_list(struct(df, tok))), s -> s.tok)").as("stoks"))
  time("join+collect+sort")(sorted.count())
  spark.stop()
}
