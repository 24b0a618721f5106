package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev runner: explain INTERNAL relations that the query surface
  * materializes eagerly during DataFrame construction (the candidate
  * chain's localCheckpoint / scratch stages), which therefore never
  * appear in a declared query's tail plan. `Explain` covers the
  * declared surface; this covers the stages under it, so plan claims
  * about them are checkable files, not narrative.
  *
  * Usage: runMain graft.tools.PlanProbe <probe> [sfDir] [--times N]
  * Probes: lshpairs (the d5/d7-family candidate-pair relation),
  *         d23weights (the TF-IDF unit-weight relation).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val probe = args(0)
    val sfDir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def rel() = probe match {
      case "lshpairs" =>
        graft.dedup.Dedup.lshCandidatePairsProjected(
          docs, col("doc_id"), col("text"), 8, 4)
      case "d23weights" =>
        graft.dedup.Dedup.tfidfUnitWeights(
          docs.select(col("doc_id"),
              graft.text.TextFunctions.tokens(col("text")).as("__toks"))
            .filter(size(col("__toks")) >= 3),
          col("doc_id"),
          graft.text.TextFunctions.wordNgramsFromTokens(col("__toks"), 3))
      case other => sys.error(s"unknown probe: $other")
    }
    rel().explain("formatted")
    (1 to times).foreach { i =>
      val t0 = System.nanoTime()
      val df = rel()
      df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
        .agg(bit_xor(col("__h"))).collect()
      println(f"[planprobe] $probe run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
