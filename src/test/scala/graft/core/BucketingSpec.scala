package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("join of two co-bucketed tables plans with NO exchange (co-located join)") {
    val orders = Tables.load(spark, sf0001, "orders")
    val customer = Tables.load(spark, sf0001, "customer")
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "customer_b", "c_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle-family join so the assertion is about bucketing,
      // not about the small side being broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(spark, "orders_b")
        .join(Bucketing.readBucketed(spark, "customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      // and it still computes the right thing
      val n = joined.count()
      val want = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(n === want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("aggregation on the bucket key needs no exchange either") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = Bucketing.readBucketed(spark, "orders_b")
        .groupBy("o_custkey").agg(sum("o_totalprice"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
