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

  test("ingest join against the bucketed band index shuffles ONLY the shard side") {
    import graft.dedup.Dedup
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow tonight",
      "how vexingly quick daft zebras jump around")
    val docs = (0L until 40L).map(i => (i, texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    def bandedOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.bandedSignatures(
        Dedup.minhashSignatures(df, col("doc_id"), col("text"), 8), 4)
    val index = bandedOf(docs.filter(col("doc_id") < 30))
    val shard = bandedOf(docs.filter(col("doc_id") >= 30))
    Dedup.writeBandIndex(index, "band_index_b", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
      val viaBucketed = Dedup.incrementalCandidatePairs(
        shard, Dedup.readBandIndex(spark, "band_index_b"))
      val viaRaw = Dedup.incrementalCandidatePairs(shard, index)
      // the bucketed index branch (cap window + band join) rides the bucket
      // partitioning: strictly fewer exchanges than the unbucketed plan
      assert(exchanges(viaBucketed) < exchanges(viaRaw),
        viaBucketed.queryExecution.executedPlan.toString)
      // and identical pairs either way
      assert(viaBucketed.as[(Long, Long)].collect().toSet ===
        viaRaw.as[(Long, Long)].collect().toSet)
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
