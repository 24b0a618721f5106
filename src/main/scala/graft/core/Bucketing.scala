package graft.core

import org.apache.spark.sql.DataFrame

/** Bucketed-table support: pre-shuffling fact tables into bucketed, sorted
  * layouts so repeated joins/aggregations on the bucket key need NO exchange
  * at query time — the pay-the-shuffle-once pattern for 100-TB manifests
  * that are joined on the same key (stem, pair id) by every downstream job.
  *
  * BucketingSpec asserts the join of two co-bucketed tables plans without
  * an Exchange operator.
  */
object Bucketing {

  /** Write `df` as a bucketed + in-bucket-sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata flows from the catalog). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
                   table: String): DataFrame = spark.table(table)
}
