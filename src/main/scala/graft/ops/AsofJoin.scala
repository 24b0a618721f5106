package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row whose time is
  * <= the left row's time, within an equi-key. Spark lacks a native as-of
  * join; composing a union + window `last(..., ignoreNulls)` avoids the
  * naive range-join + aggregation (which re-shuffles twice and explodes on
  * wide time ranges) — SURVEY J7.
  *
  * Implementation: tag both sides, union on (key, time), sort within the
  * key-window, and carry the last right-side payload forward. One shuffle on
  * the key, one in-partition sort — the plan that survives skewed keys via
  * AQE and scales linearly in rows, not in (left × right-window) pairs.
  */
object AsofJoin {

  /** leftDf(keyCol, leftTime, ...) asof-joined to rightDf(keyCol, rightTime,
    * payload). Output: left rows + `payload` from the latest right row at or
    * before `leftTime` (null if none). Tie (equal times): right row sorts
    * first, so it is visible to the left row.
    */
  def asof(leftDf: DataFrame, rightDf: DataFrame, key: String,
           leftTime: String, rightTime: String, payload: String): DataFrame = {
    val l = leftDf.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(rightDf.schema(payload).dataType))
    val r = rightDf.select(col(key), col(rightTime).as("__t"), col(payload).as("__p"))
      .withColumn("__side", lit(0))
    val unioned = l.select((l.columns.filterNot(Set("__t", "__side", "__p"))
        .toIndexedSeq.map(col) ++ Seq(col("__t"), col("__side"), col("__p"))): _*)
      .unionByName(r.select(col(key), col("__t"), col("__side"), col("__p")),
        allowMissingColumns = true)
    // Total order: (__t, __side, __p). Without __p, two right rows sharing
    // (key, time) would make last(__p) depend on shuffle order; with it the
    // max payload among time-ties deterministically wins. Left rows carry a
    // null __p which sorts first and never affects the carried value.
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$payload", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__t", "__side", "__p")
  }
}
