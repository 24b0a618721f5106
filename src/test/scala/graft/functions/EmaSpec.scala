package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmaSpec extends SparkSpec {

  import spark.implicits._

  private val decay = 0.9
  private lazy val data = {
    val rnd = new scala.util.Random(42)
    (1 to 20).flatMap { g =>
      (1 to 50).map(s => (g.toLong, s.toLong, rnd.nextDouble() * 10))
    }
  }

  private def reference: Map[Long, Double] =
    data.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.sortBy(_._2).map(_._3)
      g -> sorted.tail.foldLeft(sorted.head) { (e, x) => (1 - decay) * x + decay * e }
    }

  test("EmaAggregator matches the sequential reference fold") {
    val emaFn = Ema.ema(decay)
    val got = data.toDF("g", "s", "v").groupBy("g")
      .agg(emaFn(col("s"), col("v")).as("ema"))
      .as[(Long, Double)].collect().toMap
    reference.foreach { case (g, e) => assert(math.abs(got(g) - e) < 1e-9) }
  }

  test("closedForm window EMA matches the reference fold") {
    val got = Ema.closedForm(data.toDF("g", "s", "v"), "g", "s", "v", decay)
      .as[(Long, Double)].collect().toMap
    reference.foreach { case (g, e) => assert(math.abs(got(g) - e) < 1e-9) }
  }

  test("sortedFold streaming fold matches the reference fold across partitionings") {
    val got = Ema.sortedFold(data.toDF("g", "s", "v").repartition(7), "g", "s", "v", decay)
      .as[(Long, Double)].collect().toMap
    assert(got.size === 20)
    reference.foreach { case (g, e) => assert(math.abs(got(g) - e) < 1e-9) }
  }
}
