package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: phase-by-phase timing of the dedup mining family at a
  * given SF — the feedback loop for the mining perf work. Each phase is
  * forced with a count() so the time lands on the phase that computes it.
  */
object MineProfile {
  private def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[mine] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import graft.ops.DedupOps

    t("warmup")(spark.range(1000000).selectExpr("sum(id)").collect())

    val (repIx, docRep) = t("reps build (group + df-sort index)")(DedupOps.reps(docs))
    println(s"[mine]   reps=${repIx.count()} docs=${docRep.count()}")
    val pf = t("prefixTokenIndex build tau=0.8")(DedupOps.prefixTokenIndex(docs, 0.8))
    println(s"[mine]   prefix rows=${pf.count()}")

    t("full ngramJaccardCached tau=0.8 (mine)")(
      println(s"[mine]   pairs=${DedupOps.ngramJaccardCached(docs, 0.8).count()}"))

    t("minhashLsh full")(
      println(s"[mine]   lsh pairs=${DedupOps.minhashLsh(docs, 0.8).count()}"))

    t("dedup_incremental (split derive)")(
      println(s"[mine]   rows=${DedupOps.ngramJaccardSplit(docs,
        col("doc_id") % 2 === 1, col("doc_id") % 2 === 0, 0.9).count()}"))

    t("dedup_decontaminate (containment)")(
      println(s"[mine]   rows=${DedupOps.containmentBest(docs,
        col("doc_id") % 10 === 0, col("doc_id") % 10 =!= 0, 0.9).count()}"))

    t("tau=0.95 derive (clusters input)")(
      println(s"[mine]   rows=${DedupOps.ngramJaccardCached(docs, 0.95).count()}"))

    spark.stop()
  }
}
