package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asof picks the latest right row at or before each left time") {
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 9L, 900.0))
      .toDF("k", "rt", "payload")
    val got = AsofJoin.asof(left, right, "k", "t", "rt", "payload")
      .select(col("tag"), col("asof_payload")).as[(String, Option[Double])]
      .collect().toMap
    assert(got("a") === Some(100.0))  // tie at t=10: right row visible
    assert(got("b") === Some(200.0))
    assert(got("c") === None)         // no purchase at or before t=5
  }

  test("equal (key, time) right rows resolve deterministically to the max payload") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 7.0), (1L, 10L, 9.0), (1L, 10L, 3.0))
      .toDF("k", "rt", "payload")
    (1 to 3).foreach { i =>
      val got = AsofJoin.asof(left, right.repartition(i), "k", "t", "rt", "payload")
        .select("asof_payload").as[Double].collect().toSeq
      assert(got === Seq(9.0))
    }
  }
}
