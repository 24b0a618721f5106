package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of queries to files — the
  * r17 optimization round's plan-evidence capture
  * (`plans/r17/<query>_<suffix>.txt`). One JVM for the whole list (a
  * per-query Explain run pays ~20 s of JVM+session boot per plan).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <sfDir> <q1,q2,...|all>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, sfDir, qlist) = args.take(4)
    val names =
      if (qlist == "all") SparkEntry.queries.keys.toSeq.sorted
      else qlist.split(",").toSeq
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name ok")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage.take(200)}")
      } finally {
        spark.catalog.clearCache()
        graft.core.Scratch.cleanupNow()
      }
    }
    spark.stop()
  }
}
