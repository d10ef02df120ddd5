package tmpverify

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import java.nio.file.{Files, Paths}

/** Targeted verify: dump only the named queries + filtered oracle_sql.json,
  * so tools/check_oracle.py can gate just what changed. */
object Drive extends App {
  val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
  val outDir = args.lift(1).getOrElse("/tmp/vtarget")
  val names = args.drop(2).toSet
  val spark = SparkSession.builder()
    .master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  new java.io.File(outDir).mkdirs()
  SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
    val t0 = System.nanoTime()
    fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(f"[dump] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
  }
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  val json = SparkEntry.oracleSql.filter(kv => names(kv._1))
    .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  spark.stop()
}
