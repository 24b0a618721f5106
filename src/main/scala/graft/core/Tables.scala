package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the deterministic test tables (TESTDATA.md) and for
  * engine-native manifest relations (FIXTURES.md §A).
  *
  * All reads are plain parquet scans so Catalyst's predicate pushdown and
  * column pruning reach the file source — `.explain` on any downstream query
  * should show `PushedFilters` / a narrowed `ReadSchema`.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events table's `ts` physical type has shifted across testdata
    // generations: TIMESTAMP(NANOS) (read as a raw Long under
    // spark.sql.legacy.parquet.nanosAsLong=true), then timestamp[us] with no
    // timezone (read as TIMESTAMP_NTZ under inferTimestampNTZ). Event-time
    // operators (withWatermark, session_window, unix_micros) require the
    // zoned TIMESTAMP type, so normalize ALL shapes to TIMESTAMP here — the
    // session timezone is UTC, so the NTZ→TIMESTAMP cast is the identity
    // wall-clock mapping DuckDB's ts::TIMESTAMP oracle uses.
    if (name == "events") df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
