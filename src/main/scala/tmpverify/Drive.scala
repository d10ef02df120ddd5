package tmpverify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Drive extends App {
  val spark = SparkSession.builder()
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  def sets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, xs) => q -> xs.map(_._2).toSet }
  for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")) {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = sets(graft.ops.SimilarityOps.batchTopK(emb, 0L to 7L, 10))
    def mean(ivf: DataFrame): Double = {
      val m = sets(ivf)
      val vs = exact.keys.toSeq.sorted.map(q =>
        (m.getOrElse(q, Set.empty[Long]) & exact(q)).size / 10.0)
      vs.sum / vs.size
    }
    val dflt = mean(graft.ops.SimilarityOps.ivfBatchTopK(emb, 0L to 7L, 10))
    graft.ops.DedupOps.clearCaches(spark)
    val probeHalf = mean(graft.ops.SimilarityOps.ivfBatchTopK(emb, 0L to 7L, 10,
      nProbe = 64))
    graft.ops.DedupOps.clearCaches(spark)
    val rep5 = mean(graft.ops.SimilarityOps.ivfBatchTopK(emb, 0L to 7L, 10,
      replication = 5))
    println(s"[probe] $dir default=$dflt nProbe64=$probeHalf rep5=$rep5")
  }
  spark.stop()
}
