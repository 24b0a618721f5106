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
}
