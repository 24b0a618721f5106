package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the bit-interleave reference on random inputs") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === zRef(x, y, 16), s"($x,$y)") }
  }

  test("zValue is injective over the masked bit range") {
    val rows = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val zs = rows.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 6))
      .as[Long].collect()
    assert(zs.distinct.length === rows.length)
  }

  test("clusterByZ plans a range partitioning on the z key") {
    val df = (1L to 1000L).map(i => (i, i * 7 % 1000)).toDF("a", "b")
    val plan = Layout.clusterByZ(df, col("a"), col("b"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"), plan)
  }
}
