package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev iteration only; the driver passes 2): comma-
    // separated query names — dump/check just those
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // board-size guard (round-8 lesson): refuse to run a shrunken surface
    require(SparkEntry.queries.size == SparkEntry.declaredQueryCount,
      s"query surface ${SparkEntry.queries.size} != declared " +
        s"${SparkEntry.declaredQueryCount} — update SparkEntry.declaredQueryCount")
    var failed = List.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // queries that cache intermediates (d5, x3) must not pin storage
        // memory for the rest of the 80+-query run; scratch dirs are
        // dead once the query's parquet dump is written
        spark.catalog.clearCache()
        graft.core.Scratch.cleanupNow()
      }
    }
    if (failed.nonEmpty)
      // loud, unmissable: a failed query means the board shrinks
      System.err.println(
        s"[verify] *** ${failed.size} QUERIES FAILED (board shrinks!): " +
          failed.sorted.mkString(", "))
    // machine-visible failure record (round-9 ADVICE: stderr alone is not
    // programmatically detectable): always written, [] on a clean run, in
    // its own file so oracle_sql.json stays a pure name→SQL map
    Files.writeString(Paths.get(s"$outDir/failed_queries.json"),
      failed.sorted.map(n => "\"" + n + "\"").mkString("[", ",", "]"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // non-zero exit AFTER all outputs are written: CI / exit-code checks
    // see the shrink, while the driver still has every dump + the oracle
    // map + failed_queries.json to diagnose with
    if (failed.nonEmpty) sys.exit(2)
  }
}
