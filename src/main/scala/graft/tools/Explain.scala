package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev runner: time and/or explain a single query from SparkEntry.queries.
  *
  * Usage: runMain graft.tools.Explain <queryName> [sfDir] [--explain] [--times N]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val doExplain = args.contains("--explain")
    val times = args.sliding(2).collectFirst {
      case Array("--times", n) => n.toInt }.getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to times).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h")).agg(bit_xor(col("__h"))).collect()
      println(f"[explain] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
