package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("sessions break exactly when the gap is exceeded") {
    // user 1: events at 0, 10, 20 min (one session with gap=15 min),
    // then 60 min (new session). user 2: single event.
    val ev = Seq(
      (1L, 1L, ts(0), 1.0), (2L, 1L, ts(10), 2.0), (3L, 1L, ts(20), 3.0),
      (4L, 1L, ts(60), 4.0), (5L, 2L, ts(5), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = Sessionize.sessions(ev, "user_id", "ts", "event_id",
        gapSeconds = 15 * 60, col("value"))
      .select("user_id", "session_idx", "n_events", "sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 1L, 3L, 6.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 5.0)))
  }

  test("a gap of exactly gapSeconds does NOT break the session") {
    val ev = Seq((1L, 1L, ts(0), 1.0), (2L, 1L, ts(15), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val n = Sessionize.sessions(ev, "user_id", "ts", "event_id",
      gapSeconds = 15 * 60, col("value")).count()
    assert(n === 1L)
  }

  test("tied timestamps stay in one session regardless of tie order") {
    val ev = Seq((2L, 1L, ts(0), 1.0), (1L, 1L, ts(0), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val rows = Sessionize.withSessionIds(ev, "user_id", "ts", "event_id", 60)
      .select("session_idx").as[Long].collect()
    assert(rows.toSet === Set(1L))
  }
}
