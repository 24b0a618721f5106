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

  /** Write `df` as a bucketed + in-bucket-sorted managed parquet table.
    * Replaces any previous incarnation: with the in-memory catalog a
    * PREVIOUS session's managed location can survive on disk with no
    * catalog entry, and saveAsTable("overwrite") refuses such an orphan
    * (LOCATION_ALREADY_EXISTS) — so the stale location is dropped first.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    // simple (single-part) names only: the stale-location cleanup below
    // derives the managed path as warehouse.dir/<name> — a qualified
    // `db.tbl` would be DROPped as one backtick-quoted identifier while
    // the delete hit the wrong directory. Fail loudly instead of
    // corrupting either side.
    require(!table.contains(".") && !table.contains("`"),
      s"writeBucketed: '$table' must be a simple (unqualified) table name")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc) && !fs.delete(loc, true))
      throw new IllegalStateException(
        s"writeBucketed: could not remove stale table location $loc")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Append a shard to an EXISTING bucketed table — the incremental-ingest
    * half of the pay-the-shuffle-once pattern: only the shard is shuffled
    * into buckets (cost tracks the shard, not the table), each append lands
    * one more bucket-tagged file set per bucket, and bucket pruning /
    * exchange-free joins keep working because every file carries its bucket
    * id. `key`/`buckets` must match the spec the table was created with
    * ([[writeBucketed]]) — Spark validates and fails loudly on mismatch.
    */
  def appendBucketed(df: DataFrame, table: String, key: String,
                     buckets: Int): Unit =
    df.write.mode("append").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata flows from the catalog). */
  def readBucketed(spark: org.apache.spark.sql.SparkSession,
                   table: String): DataFrame = spark.table(table)
}
