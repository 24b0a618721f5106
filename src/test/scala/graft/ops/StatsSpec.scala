package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  import spark.implicits._

  test("arrayMse/psnr/ssimLite match hand-computed values") {
    import spark.implicits._
    val df = Seq(
      (1, Array(0.0, 0.0), Array(1.0, 1.0)),            // mse 1 → psnr 0 dB
      (2, Array(0.25, 0.75, 0.5), Array(0.25, 0.75, 0.5))) // identical
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        Stats.arrayMse(col("a"), col("b")).as("mse"),
        Stats.psnr(col("a"), col("b")).as("psnr"),
        Stats.ssimLite(col("a"), col("b")).as("ssim"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(1).getDouble(1) === 1.0)
    assert(got(1).getDouble(2) === 0.0)
    // identical arrays: exact zero error (the dot decomposition cancels
    // exactly), infinite PSNR, SSIM exactly 1
    assert(got(2).getDouble(1) === 0.0)
    assert(got(2).getDouble(2).isPosInfinity)
    assert(got(2).getDouble(3) === 1.0)
  }

  test("exactPercentiles matches the built-in percentile aggregate") {
    // deterministic values with duplicates, negative numbers, and group
    // sizes that hit both the exact-position (frac=0) and interpolated
    // branches
    val df = (1 to 101).map(i => (s"g${i % 3}", (i * 37 % 50) - 10.0))
      .toDF("grp", "v")
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val got = Stats.exactPercentiles(df, Seq("grp"), col("v"), ps, roundTo = 6)
      .orderBy("grp")
      .as[(String, Double, Double, Double, Double)].collect()
    val want = df.groupBy("grp").agg(
        round(expr("percentile(v, 0.25)"), 6).as("p25"),
        round(expr("percentile(v, 0.5)"), 6).as("p50"),
        round(expr("percentile(v, 0.9)"), 6).as("p90"),
        round(expr("percentile(v, 0.99)"), 6).as("p99"))
      .orderBy("grp")
      .as[(String, Double, Double, Double, Double)].collect()
    assert(got === want)
  }

  test("exactPercentiles ignores null values but keeps all-null groups") {
    val df = Seq(("a", Some(5.0)), ("a", None), ("b", Some(7.0)), ("c", None))
      .toDF("grp", "v")
    val got = Stats.exactPercentiles(df, Seq("grp"), col("v"),
        Seq("p50" -> 0.5), roundTo = 6)
      .orderBy("grp").as[(String, Option[Double])].collect()
    // like percentile()/quantile_cont: group c survives with a NULL p50
    assert(got === Array(("a", Some(5.0)), ("b", Some(7.0)), ("c", None)))
  }
}
