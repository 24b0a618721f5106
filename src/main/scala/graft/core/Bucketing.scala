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
    dropTableAndStaleLocation(spark, table)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** DROP `table` and delete any surviving managed location: with the
    * in-memory catalog a PREVIOUS session's (or a crashed run's) managed
    * directory can linger on disk with no catalog entry, and
    * saveAsTable refuses such an orphan (LOCATION_ALREADY_EXISTS). Shared
    * by [[writeBucketed]] and [[compactBucketed]]'s scratch write so
    * retries of a crashed write are self-healing on both paths.
    */
  private def dropTableAndStaleLocation(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      // Locale.ROOT to match the catalog's own identifier normalization —
      // a tr_TR default locale would lowercase 'I' to dotless 'ı' and miss
      // the stale directory
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc) && !fs.delete(loc, true))
      throw new IllegalStateException(
        s"Bucketing: could not remove stale table location $loc")
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

  /** COMPACT an appended-to bucketed table back to one file per bucket.
    *
    * [[appendBucketed]] lands one more file set per bucket on every
    * ingest — correct (every file carries its bucket id, so pruning and
    * exchange-free joins keep working) but degrading: after N daily
    * appends each bucket is N files, and every query pays N× the open/
    * footer cost plus an N-way merge behind the in-bucket sort. This
    * rewrite is the companion maintenance op: one shuffle of the table
    * into exactly `numBuckets` output files (repartition on the bucket
    * key matches Spark's bucket hashing, so each task holds exactly one
    * bucket's rows and the bucketed write emits one file per bucket),
    * preserving the catalog bucket spec and in-bucket sort order.
    *
    * Epoch-swap crash discipline (the [[graft.ops.Snapshots.compactTo]]
    * pattern): the compacted copy is fully written to a scratch table
    * first; only then is the original dropped and the scratch renamed
    * into place. A crash before the DROP leaves the original live (the
    * scratch is garbage to clean); a crash between DROP and RENAME
    * leaves the compacted data recoverable under `<table>__compact`.
    * Single-writer by contract, like the appends it compacts.
    *
    * Run it on the same cadence a snapshot chain runs compactTo — e.g.
    * every K ingests of a d9 band index or v15 IVF-PQ index — and the
    * per-query file count stays O(numBuckets) instead of O(appends).
    */
  def compactBucketed(spark: org.apache.spark.sql.SparkSession,
                      table: String,
                      transform: DataFrame => DataFrame = identity): Unit = {
    require(!table.contains(".") && !table.contains("`"),
      s"compactBucketed: '$table' must be a simple (unqualified) table name")
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"compactBucketed: table '$table' is not bucketed"))
    require(spec.bucketColumnNames.size == 1,
      s"compactBucketed: expected a single bucket column, got ${spec.bucketColumnNames}")
    val key = spec.bucketColumnNames.head
    val n = spec.numBuckets
    val sortCols = spec.sortColumnNames
    val scratch = table + "__compact"
    // stale-location cleanup, not just DROP: a crash mid-scratch-write
    // leaves the scratch DATA directory on disk with NO catalog entry, so
    // a bare DROP IF EXISTS is a no-op and the retry's saveAsTable fails
    // with LOCATION_ALREADY_EXISTS (round-9 ADVICE)
    dropTableAndStaleLocation(spark, scratch)
    // SHUFFLE-FREE rewrite: force the bucketed scan (the auto-bucketed-scan
    // heuristic would disable it for a bare scan-to-write plan, leaving
    // arbitrary file-split partitions while the optimizer ALSO elides any
    // repartition on the key as redundant against the table's logical
    // partitioning — every task would then hold rows of every bucket and
    // the write would emit tasks×buckets files). With the bucketed scan on,
    // each task reads exactly one bucket's N appended files and the
    // bucketed write emits exactly one file for it: no exchange anywhere —
    // compaction cost is read + write, never a shuffle of the index.
    val autoScan = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoScan)
    try {
      spark.conf.set(autoScan, "false")
      // `transform` lets maintenance rewrites fold row-level work into the
      // same pass (e.g. physically dropping tombstoned ids). It must be
      // partitioning-preserving — broadcast joins and filters are; anything
      // that re-shuffles the key would break the one-task-per-bucket write.
      val w = transform(spark.table(table))
        .write.format("parquet").bucketBy(n, key)
      (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
        .saveAsTable(scratch)
    } finally spark.conf.set(autoScan, prev)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$scratch` RENAME TO `$table`")
  }

  /** Has shard `shardId` been recorded against `table`'s ingest ledger?
    * See [[ingestOnce]].
    */
  def ingestApplied(spark: org.apache.spark.sql.SparkSession,
                    table: String, shardId: String): Boolean = {
    import org.apache.spark.sql.functions.col
    val ledger = table + "__ingests"
    spark.catalog.tableExists(ledger) &&
      spark.table(ledger).filter(col("shard_id") === shardId)
        .limit(1).count() > 0
  }

  /** Record shard `shardId` in `table`'s ingest ledger (a tiny managed
    * parquet table `<table>__ingests`, one row per applied shard).
    */
  def markIngested(spark: org.apache.spark.sql.SparkSession,
                   table: String, shardId: String): Unit = {
    import spark.implicits._
    Seq(shardId).toDF("shard_id")
      .write.mode("append").format("parquet").saveAsTable(table + "__ingests")
  }

  /** IDEMPOTENT ingest guard — the at-least-once reality of any scheduler
    * (a crashed day-2 job WILL be re-run) made safe for append-path
    * tables, which otherwise double-append the shard: `body` runs only if
    * `shardId` is not yet in the table's ledger, and is recorded after it
    * completes. Returns true if body ran, false if the shard was already
    * applied (the rerun no-op).
    *
    * Crash contract: a crash DURING body or between body and the marker
    * write leaves the marker absent, so the rerun re-appends — a bounded
    * duplication window (one shard), healed physically by the next
    * [[compactBucketed]] with `transform = _.dropDuplicates()`: exact
    * replayed rows collapse inside the same shuffle-free one-task-per-
    * bucket pass (dedup keys ⊇ the bucket key, so the aggregate rides
    * the bucketed scan's partitioning — asserted in BucketingSpec).
    * Marker-before-body would trade this for silent shard LOSS on crash;
    * duplicates that compaction heals are the right side of that trade.
    * Single-writer per table, like the appends it guards.
    */
  def ingestOnce(spark: org.apache.spark.sql.SparkSession,
                 table: String, shardId: String)(body: => Unit): Boolean = {
    require(!table.contains(".") && !table.contains("`"),
      s"ingestOnce: '$table' must be a simple (unqualified) table name")
    if (ingestApplied(spark, table, shardId)) false
    else {
      body
      markIngested(spark, table, shardId)
      true
    }
  }

  /** Bucket count of a managed table from the catalog (0 if unbucketed) —
    * lets maintenance cadence logic reason in files-per-bucket without the
    * caller re-supplying the spec it wrote the table with.
    */
  def bucketCount(spark: org.apache.spark.sql.SparkSession,
                  table: String): Int =
    spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec.map(_.numBuckets).getOrElse(0)

  /** Data files of a bucketed managed table (maintenance/diagnostics: the
    * per-bucket file growth [[compactBucketed]] exists to reverse).
    */
  def dataFiles(spark: org.apache.spark.sql.SparkSession,
                table: String): Seq[String] = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(loc)) Nil
    else fs.listStatus(loc).toSeq.map(_.getPath.getName)
      .filter(f => !f.startsWith("_") && !f.startsWith("."))
  }
}
