package graft.functions

import graft.SparkSpec
import graft.extensions.GraftExtensions
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class TokenCountExprSpec extends SparkSpec {

  import spark.implicits._

  private val tricky = Seq(
    "", "   ", "hello world", "The QUICK-brown fox_42!", "a",
    "...!!!", "héllo wörld", "日本語 text 123", "tab\tsep\nlines",
    "a1b2c3", " lead", "trail ")

  test("native expression matches the HOF token count on tricky strings") {
    GraftExtensions.register(spark)
    val got = tricky.toDF("t").select(
        call_function("graft_token_count", col("t")).as("n"),
        TextFunctions.tokenCount(col("t")).as("h"))
      .as[(Int, Int)].collect()
    got.zip(tricky).foreach { case ((n, h), s) =>
      assert(n === h, s"mismatch on '$s'")
    }
  }

  test("parity holds on arbitrary unicode strings (ScalaCheck)") {
    GraftExtensions.register(spark)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAll(Gen.listOfN(20, Gen.asciiPrintableStr)) { ss =>
        val rows = ss.toDF("t").select(
            call_function("graft_token_count", col("t")),
            TextFunctions.tokenCount(col("t")))
          .as[(Int, Int)].collect()
        rows.forall { case (n, h) => n == h }
      })
    assert(res.passed, res.status.toString)
  }

  test("usable from SQL and stays inside codegen over a file scan") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("docs_native")
    val df = spark.sql("SELECT graft_token_count(text) AS n FROM docs_native")
    val hof = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().sorted.toSeq === hof.as[Int].collect().sorted.toSeq)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // whole-stage codegen stage marker
  }
}
