package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (round 15): decompose a query's wall time into
  * read-relation creation, analysis+optimization+physical planning, and
  * execution — to size the fixed per-query overhead across the 288-query
  * bench before optimizing individual operators.
  */
object ProfileFixed {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "join_inner_equi", "window_rank", "tpch_q3_top_orders")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup (same as Bench)
    spark.range(1000000).selectExpr("sum(id) s").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // 1. raw read-relation cost (listing + schema inference), repeated
    for (t <- Seq("lineitem", "orders", "events", "documents")) {
      val ts = (1 to 5).map(_ => time(spark.read.parquet(s"$sfDir/$t.parquet"))._1)
      println(f"[profile] read($t%-9s) per-call: ${ts.map(x => f"$x%.3f").mkString(" ")}")
      val sch = spark.read.parquet(s"$sfDir/$t.parquet").schema
      val ts2 = (1 to 5).map(_ => time(spark.read.schema(sch).parquet(s"$sfDir/$t.parquet"))._1)
      println(f"[profile] read+schema($t%-9s): ${ts2.map(x => f"$x%.3f").mkString(" ")}")
      // count() on a memoized relation vs a fresh one — does relation reuse
      // change execution cost?
      val fresh = time(spark.read.parquet(s"$sfDir/$t.parquet").count())
      val reused = spark.read.schema(sch).parquet(s"$sfDir/$t.parquet")
      val c1 = time(reused.count()); val c2 = time(reused.count())
      println(f"[profile] count fresh=${fresh._1}%.3f reusedPlan1=${c1._1}%.3f reusedPlan2=${c2._1}%.3f")
    }

    // 2. per-query breakdown: build df (read+logical), force executedPlan
    //    (analyze/optimize/plan), then execute via count()
    for (name <- names; rep <- 1 to 3) {
      val fn = graft.queries.Catalog.queriesMap(name)
      val (tBuild, df) = time(fn(spark, sfDir))
      val (tPlan, _) = time(df.queryExecution.executedPlan)
      val (tExec, n) = time(df.count())
      println(f"[profile] $name%-24s rep$rep build=$tBuild%6.3f plan=$tPlan%6.3f exec=$tExec%6.3f rows=$n")
    }
    spark.stop()
  }
}
