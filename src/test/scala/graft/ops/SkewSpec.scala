package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  import spark.implicits._

  // 10k rows on the hot key, a handful elsewhere — the shape that makes
  // one reducer the straggler.
  private lazy val fact = ((1L to 10000L).map(i => ("hot", i, 1.0)) ++
    Seq(("a", 20001L, 5.0), ("b", 20002L, 7.0)))
    .toDF("key", "row_id", "v")

  test("saltedSum equals the unsalted aggregate") {
    val plain = fact.groupBy("key")
      .agg(sum("v").as("sum"), count(lit(1)).as("cnt"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedSum(fact, col("key"), col("row_id"), col("v"), 16)
      .as[(String, Double, Long)].collect().toSet
    assert(salted === plain)
  }

  test("saltedJoin equals the unsalted join, rows spread over salt buckets") {
    val dim = Seq(("hot", "H"), ("a", "A"), ("b", "B"), ("unused", "U"))
      .toDF("key", "label")
    val plain = fact.join(dim, "key").select("row_id", "label")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "key", col("row_id"), 8)
      .select("row_id", "label").as[(Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.size === 10002)
  }
}
