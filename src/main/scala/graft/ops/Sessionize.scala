package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group a keyed event stream into sessions that
  * break whenever consecutive events (event-time order) are more than
  * `gapSeconds` apart — the batch twin of Structured Streaming's
  * `session_window` (which graft.streaming uses for the unbounded form).
  *
  * Shape: one window per key (lag for the gap flag, running sum for the
  * session ordinal). Parallelism = #keys; per-key state is an external
  * (spillable) sort, so a hot key degrades to disk, not OOM. Session
  * boundaries depend only on the sorted timestamp VALUES, so the output is
  * deterministic even when timestamps tie (`tieBreak` makes the row order
  * itself total for the lag).
  */
object Sessionize {

  /** Adds `session_idx` (1-based per-key session ordinal, event-time
    * ordered). Input columns are untouched.
    */
  def withSessionIds(df: DataFrame, key: String, ts: String, tieBreak: String,
                     gapSeconds: Long): DataFrame = {
    val ord = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    val prev = lag(col(ts), 1).over(ord)
    // micros, not seconds: the timestamps carry sub-second precision and a
    // gap compare on truncated seconds would misclassify near-gap events
    val isNew = when(prev.isNull ||
      unix_micros(col(ts)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("__new_sess", isNew)
      .withColumn("session_idx", sum(col("__new_sess"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_sess")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessions(df: DataFrame, key: String, ts: String, tieBreak: String,
               gapSeconds: Long, value: Column, roundTo: Int = 4): DataFrame =
    withSessionIds(df, key, ts, tieBreak, gapSeconds)
      .groupBy(col(key), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        round(sum(value), roundTo).as("sum_value"))

  /** Strict-order FUNNEL, earliest-chain semantics: per key, stage k's
    * timestamp is the earliest stage-k event STRICTLY AFTER stage k-1's
    * timestamp (the standard product-analytics funnel — each step must
    * happen after the previous one actually happened, not merely
    * co-occur). Keys with no stage-1 event are absent: the funnel entry
    * defines the cohort.
    *
    * Scale shape: one filtered aggregate + one key-equi-join per stage —
    * never a self-join of the raw event log against itself, never a
    * per-key event buffer, so a key with millions of events costs the
    * same as one with ten. Each stage's join input shrinks monotonically
    * (only keys that reached the previous stage).
    *
    * Output: (key, t_<stage1>, ..., t_<stageN>, stages_reached).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel: empty stage list")
    require(stages.distinct.size == stages.size,
      s"funnel: duplicate stage names in $stages")
    val s0 = events.filter(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(s"t_${stages.head}"))
    val full = stages.zipWithIndex.drop(1).foldLeft(s0) { case (acc, (st, i)) =>
      val prev = s"t_${stages(i - 1)}"
      val next = events.filter(col(typeCol) === st)
        .select(col(keyCol), col(tsCol))
        .join(acc.select(col(keyCol), col(prev)), Seq(keyCol))
        .filter(col(tsCol) > col(prev))
        .groupBy(col(keyCol)).agg(min(col(tsCol)).as(s"t_$st"))
      acc.join(next, Seq(keyCol), "left")
    }
    full.withColumn("stages_reached",
      stages.map(st => when(col(s"t_$st").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int"))
  }

  /** The conversion summary over [[funnel]]: per stage (1-indexed, in
    * funnel order), how many keys reached it — the chart a funnel is run
    * for. Derived from the funnel relation with one tiny aggregate.
    */
  def funnelCounts(events: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame =
    funnel(events, keyCol, tsCol, typeCol, stages)
      .select(explode(sequence(lit(1), col("stages_reached"))).as("stage_idx"))
      .groupBy("stage_idx")
      .agg(count(lit(1)).as("n_keys"))
      .withColumn("stage",
        element_at(typedLit(stages), col("stage_idx").cast("int")))

  /** Day-granularity COHORT RETENTION — the funnel's sibling: keys are
    * cohorted by the day of their FIRST event, and each later active day
    * lands in (cohort_day, day_offset) with the fraction of the cohort
    * still active. Offset 0 is the cohort day itself (retention 1.0 by
    * construction — the sanity row).
    *
    * Scale shape: one first-event aggregate (map-side min), one distinct
    * over (key, day) — both collapse the raw log before anything joins —
    * then a key-equi-join of two key-sized relations and two tiny
    * aggregates. The raw event log is never self-joined and never
    * shuffled twice.
    */
  def retention(events: DataFrame, keyCol: String, tsCol: String,
                roundTo: Int = 6): DataFrame = {
    val first = events.groupBy(col(keyCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val active = events.select(col(keyCol), to_date(col(tsCol)).as("day"))
      .distinct()
    val sizes = first.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    active.join(first, keyCol)
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        col(keyCol))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_day")
      .withColumn("retention",
        round(col("n_active") / col("cohort_size"), roundTo))
  }
}
