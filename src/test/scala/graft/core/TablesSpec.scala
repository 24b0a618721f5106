package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins the event-time normalization contract: the testdata generator has
  * shipped `events.ts` as TIMESTAMP(NANOS)-as-Long, as TIMESTAMP_NTZ
  * micros, and as zoned TIMESTAMP across regenerations, and every
  * event-time operator (withWatermark, session_window, unix_micros)
  * requires the zoned type. The loader must map ALL shapes to the same
  * wall-clock TIMESTAMP under the UTC session timezone — per shape, not
  * just whichever one the current testdata happens to use.
  */
class TablesSpec extends SparkSpec {

  import spark.implicits._
  import graft.streaming.Streaming.normalizeEventTs

  // 2021-06-15T12:34:56.789012 UTC as micros since epoch
  private val micros = 1623760496789012L

  test("normalizeEventTs: nanos-as-Long becomes the truncated-to-micros timestamp") {
    val df = Seq((1L, micros * 1000L + 999L)).toDF("event_id", "ts")
    val out = normalizeEventTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() === micros)
  }

  test("normalizeEventTs: TIMESTAMP_NTZ becomes the same wall-clock zoned timestamp") {
    val df = Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType === TimestampNTZType)
    val out = normalizeEventTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    // session tz is UTC, so NTZ wall-clock == zoned instant
    assert(out.select(unix_micros(col("ts"))).as[Long].head() === micros)
  }

  test("normalizeEventTs: an already-zoned timestamp passes through unchanged") {
    val df = Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    val out = normalizeEventTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() === micros)
  }

  test("Tables.load(events) yields a zoned ts whatever the current testdata generation uses") {
    val ev = Tables.load(spark, sf0001, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
  }
}
