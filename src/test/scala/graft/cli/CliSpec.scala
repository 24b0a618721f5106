package graft.cli

import graft.SparkSpec
import java.nio.file.Files

/** Smoke tests for the CLI arg surface — the flag parsing and wiring into
  * the pipeline operators, driven through Main.run on the shared session
  * (Main.main owns and stops its own session).
  */
class CliSpec extends SparkSpec {

  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("dedup subcommand: --pre-clean and --decontaminate reach the pipeline") {
    val long = "the quick brown fox jumps over the lazy dog and then runs " +
      "far away into the quiet green forest to rest for a while longer"
    val evalText = "held out benchmark question about the capital of france " +
      "and its famous tower near the river in the spring"
    val docs = Seq(
      (1L, "<p>" + long + " reach me at carol@example.org</p>", "a"),
      (2L, "leaked copy of the held out benchmark question about the " +
        "capital of france pasted into otherwise long unremarkable prose " +
        "about european travel and geography for padding", "b"),
      (3L, "completely different content about spark shuffles and " +
        "partitions and aggregate hash maps spilling to local disk under " +
        "memory pressure during wide transformations at large scale", "b"))
      .toDF("doc_id", "text", "source")
    val docsDir = tmpDir("cli_docs")
    val evalDir = tmpDir("cli_eval")
    val outDir = tmpDir("cli_out") + "/kept"
    docs.write.mode("overwrite").parquet(docsDir)
    Seq((100L, evalText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(evalDir)
    Main.run(spark, Array("dedup", "--docs", docsDir,
      "--pre-clean", "--decontaminate", evalDir, "--output", outDir))
    val kept = spark.read.parquet(outDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(kept.keySet === Set(1L, 3L), s"got ${kept.keySet}")
    assert(!kept(1L).contains("carol@example.org") && !kept(1L).contains("<p>"))
    assert(kept(1L).contains("<EMAIL>"))
  }

  test("mixture subcommand: temperature plan lands in --output as json") {
    val docs = (0L until 30L).map(i =>
        (i, "some text content here", if (i < 24) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val docsDir = tmpDir("cli_mix")
    val outDir = tmpDir("cli_mixout") + "/plan"
    docs.write.mode("overwrite").parquet(docsDir)
    Main.run(spark, Array("mixture", "--docs", docsDir,
      "--alpha", "0.5", "--budget", "10", "--output", outDir))
    val plan = spark.read.json(outDir)
    assert(plan.count() === 2L) // one row per lang
  }
}
