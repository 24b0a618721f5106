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

  test("funnel is strict-order earliest-chain: out-of-order stages don't count") {
    val stages = Seq("view", "click", "buy")
    val ev = Seq(
      // user 1: full funnel in order — all 3 reached
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "buy", ts(9)),
      // user 2: clicked BEFORE first view; a later click exists, so the
      // chain picks the post-view click (min AFTER t_view, not global min)
      (2L, "click", ts(0)), (2L, "view", ts(2)), (2L, "click", ts(7)),
      // user 3: bought before clicking — buy must NOT count (strict order)
      (3L, "view", ts(0)), (3L, "buy", ts(1)), (3L, "click", ts(4)),
      // user 4: never viewed — not in the cohort at all
      (4L, "click", ts(0)), (4L, "buy", ts(1)),
      // user 5: tie — click at the SAME instant as view is not after it
      (5L, "view", ts(3)), (5L, "click", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val got = Sessionize.funnel(ev, "user_id", "ts", "event_type", stages)
      .select("user_id", "t_view", "t_click", "t_buy", "stages_reached")
      .as[(Long, java.sql.Timestamp, Option[java.sql.Timestamp],
        Option[java.sql.Timestamp], Int)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 5L))
    assert(got(1L) === ((ts(0), Some(ts(5)), Some(ts(9)), 3)))
    assert(got(2L) === ((ts(2), Some(ts(7)), None, 2)))
    assert(got(3L) === ((ts(0), Some(ts(4)), None, 2)))
    assert(got(5L) === ((ts(3), None, None, 1)))
    // conversion chart: 4 viewed, 3 clicked after viewing, 1 bought after
    val counts = Sessionize.funnelCounts(ev, "user_id", "ts", "event_type",
        stages)
      .select("stage_idx", "stage", "n_keys")
      .as[(Long, String, Long)].collect().toSet
    assert(counts === Set((1L, "view", 4L), (2L, "click", 3L),
      (3L, "buy", 1L)))
  }

  test("retention: cohort by first-event day, offset-0 is always 1.0, multiple same-day events count once") {
    def day(d: Int, h: Int = 0) =
      new java.sql.Timestamp((d * 24L + h) * 3600000L)
    val ev = Seq(
      // cohort day 0: users 1, 2. user 1 active days 0, 1, 3 (two events
      // on day 1 — still one active day); user 2 active day 0 only
      (1L, day(0)), (1L, day(1)), (1L, day(1, 5)), (1L, day(3)),
      (2L, day(0, 8)),
      // cohort day 1: user 3 active days 1 and 2
      (3L, day(1)), (3L, day(2)))
      .toDF("user_id", "ts")
    val got = Sessionize.retention(ev, "user_id", "ts")
      .selectExpr("CAST(cohort_day AS STRING)", "day_offset", "n_active",
        "cohort_size", "retention")
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val d0 = "1970-01-01"; val d1 = "1970-01-02"
    assert(got.keySet === Set((d0, 0), (d0, 1), (d0, 3), (d1, 0), (d1, 1)))
    assert(got((d0, 0)) === ((2L, 2L, 1.0)))   // both cohort members day 0
    assert(got((d0, 1)) === ((1L, 2L, 0.5)))   // only user 1; dup collapsed
    assert(got((d0, 3)) === ((1L, 2L, 0.5)))
    assert(got((d1, 0)) === ((1L, 1L, 1.0)))
    assert(got((d1, 1)) === ((1L, 1L, 1.0)))
  }
}
