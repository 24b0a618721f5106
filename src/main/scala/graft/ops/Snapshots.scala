package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned-snapshot table — time-travel-lite over keyed MERGE epochs.
  *
  * Deliberately NOT a Delta/Iceberg transaction log (README "Deliberate
  * exclusions"): no commit protocol, no concurrent writers, no file-level
  * manifests. What it does cover is the query users actually run against
  * such logs: "the table as of version V". The layout is append-only
  * parquet partitions `_v=N` (one per MERGE epoch, each holding at most
  * one row per key — the s11 keyed-refresh output shape, optionally with
  * a boolean delete marker); a snapshot at V is the last-writer-wins row
  * per key over all epochs `_v <= V`, minus keys whose winning row is a
  * delete.
  *
  * Scale shape: the `_v <= V` cut is PARTITION PRUNING (epochs are
  * directories — untouched epochs are never read), and last-writer-wins
  * is a map-side-combining max_by aggregate on the key — ONE shuffle of
  * the epochs actually read, no window sort. At 100 TB the epoch chain is
  * periodically compacted with [[compactTo]] (the snapshot becomes the
  * new base epoch; history below it is dropped), so replay length stays
  * O(epochs since last compaction).
  *
  * Reference: checkpoint refresh/rollback flows
  * (checkpoints/download.py) — re-expressed as a versioned lake layout.
  */
object Snapshots {

  /** Write one MERGE epoch: `df` (at most one row per key; may carry a
    * boolean delete-marker column) becomes partition `_v=version`.
    * Overwrites that epoch only — earlier epochs are immutable.
    *
    * `uniqueOn` (optional) ENFORCES the one-row-per-key contract before
    * writing: [[readAsOf]]'s max_by resolves last-writer-wins by `_v`
    * alone, so a duplicate key inside one epoch would make snapshots
    * nondeterministic with no error pointing at the bad epoch. The check
    * is one aggregate over the epoch (epochs are refresh-sized); pass
    * the key columns anywhere the input is not trusted (the CLI does).
    */
  def writeEpoch(df: DataFrame, dir: String, version: Int,
                 uniqueOn: Seq[String] = Nil): Unit = {
    // a data column named _v would collide with the partition column at
    // read time and silently shadow the version — fail loudly instead
    require(!df.columns.contains("_v"),
      "writeEpoch: input must not carry a _v column (reserved for the epoch version)")
    if (uniqueOn.nonEmpty) {
      val dup = df.groupBy(uniqueOn.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1)
        .collect()
      require(dup.isEmpty,
        s"writeEpoch: epoch $version has more than one row for key " +
          s"${dup.headOption.map(_.toString).getOrElse("")} — the one-row-per-key-per-epoch " +
          "contract would make readAsOf nondeterministic")
    }
    df.write.mode("overwrite").parquet(s"$dir/_v=$version")
  }

  /** The table as of `version`: last-writer-wins per key over epochs
    * `_v <= version` (partition-pruned scan), with rows whose winning
    * epoch marked them deleted (`deletedCol` true) removed. Ties cannot
    * occur by the one-row-per-key-per-epoch contract.
    */
  def readAsOf(spark: SparkSession, dir: String, keyCols: Seq[String],
               version: Int, deletedCol: String = "_deleted"): DataFrame = {
    // an empty key set would make groupBy() a single global aggregate and
    // return one arbitrary row — never what a snapshot read means
    require(keyCols.nonEmpty, "readAsOf: keyCols must be non-empty")
    // history below a compaction point is GONE by design — an asOf there
    // must fail loud, not return an empty (silently wrong) snapshot
    val vs = versions(spark, dir)
    require(vs.isEmpty || version >= vs.min,
      s"readAsOf: version $version predates the oldest epoch ${vs.headOption.getOrElse(-1)} — " +
        "history below a compaction point no longer exists")
    val all = spark.read.parquet(dir).filter(col("_v") <= version)
    val snap = all
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(all.columns.toIndexedSeq.map(col): _*), col("_v")).as("__r"))
      .select(col("__r.*"))
    val live =
      if (snap.columns.contains(deletedCol))
        snap.filter(!coalesce(col(deletedCol), lit(false))).drop(deletedCol)
      else snap
    live.drop("_v")
  }

  /** All epoch versions present under `dir` — a pure directory listing
    * (one FS metadata call, no Spark job, no data files read; the honest
    * version of the claim, since a parquet-read distinct would scan the
    * table).
    */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else {
      val names = fs.listStatus(p).toSeq.map(_.getPath.getName)
      // driver-side listing is epoch-count-sized by design; a directory
      // with an absurd entry count means something else is being pointed
      // at — fail loud before materializing it (r16 What's-wrong #2)
      require(names.size <= 100000,
        s"versions: $dir lists ${names.size} entries — not an epoch " +
          "directory (cap 100000); wrong --dir?")
      names.filter(_.startsWith("_v="))
        .flatMap(n => scala.util.Try(n.stripPrefix("_v=").toInt).toOption)
        .sorted
    }
  }

  /** Compact history up to `version`: materialize [[readAsOf]](version)
    * as the new base epoch `_v=version` and drop every earlier epoch
    * directory. Snapshots at `version` and later are unchanged (later
    * epochs still override the base per key; keys whose winner at
    * `version` was a delete are simply absent from the base, which is
    * what readAsOf returned anyway); history BELOW `version` is
    * deliberately gone — that is the point. This bounds the epoch-chain
    * length a 100 TB deployment replays: run periodically, the chain
    * stays O(epochs since last compaction).
    *
    * The base is staged to `<dir>/.compact_tmp` first; a failure during
    * the WRITE leaves the original chain intact, and a failure during
    * the swap (delete/rename report failure as booleans — both are
    * checked and rethrown) leaves the staged base in `.compact_tmp` for
    * manual recovery. Single-writer by contract, like every epoch
    * operation here.
    *
    * CONCURRENT READERS: compaction deletes epoch directories a reader
    * planned before the swap may still reference. The guarantee is
    * succeed-or-fail-loud, never silently wrong: a pre-planned readAsOf
    * either completes against the files it captured or throws on the
    * missing ones (SnapshotsSpec asserts this), and a FRESH readAsOf
    * below the compaction point is rejected by the oldest-epoch guard.
    * Schedule compaction in the ingest process (e.g.
    * [[graft.streaming.Streaming.snapshotEpochStream]]'s compactEvery),
    * not concurrently with ad-hoc history reads.
    */
  def compactTo(spark: SparkSession, dir: String, keyCols: Seq[String],
                version: Int, deletedCol: String = "_deleted"): Unit = {
    // the base must keep the chain's schema: readAsOf drops the delete
    // marker, but later epochs still carry it — a mixed-schema partition
    // read would resolve against whichever footer it samples
    val hadDeleted = spark.read.parquet(dir).columns.contains(deletedCol)
    val snap = readAsOf(spark, dir, keyCols, version, deletedCol)
    val base = if (hadDeleted) snap.withColumn(deletedCol, lit(false)) else snap
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = s"$dir/.compact_tmp"
    base.write.mode("overwrite").parquet(tmp)
    // Hadoop delete/rename report failure as a BOOLEAN, not an exception —
    // ignoring it here would silently destroy the chain on a failed swap.
    // Order: olds are deleted only after the staged base is fully written;
    // a throw mid-swap leaves the base recoverable in .compact_tmp.
    versions(spark, dir).filter(_ <= version).foreach { v =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/_v=$v")
      if (!fs.delete(p, true) && fs.exists(p))
        throw new IllegalStateException(
          s"compactTo: could not delete epoch $p; staged base left at $tmp")
    }
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(s"$dir/_v=$version")))
      throw new IllegalStateException(
        s"compactTo: rename $tmp -> ${s"$dir/_v=$version"} failed; " +
          "staged base left in place for manual recovery")
  }
}
