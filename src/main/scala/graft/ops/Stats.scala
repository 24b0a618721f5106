package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metric-statistics aggregations (SURVEY §2.4).
  *
  * Reference semantics:
  *  - stats pack mean/std/min/max per metric over per-sample values, numpy
  *    ddof=0 ⇒ population std (reference: train/common/metrics.py:453-462);
  *  - mIoU: per-class intersection/union sums, classes with union=0 excluded
  *    from the mean (reference: train/common/metrics.py:223-248);
  *  - PCK: fraction of keypoints within a pixel threshold
  *    (reference: train/common/metrics.py:250-268);
  *  - pivoted cross-model summary tables
  *    (reference: train/evaluate_all_models.py:106-116).
  *
  * All are single hash-aggregates (partial map-side combine for free); the
  * pivot enumerates its values explicitly so the plan needs no extra
  * distinct-collect pass on the driver.
  */
object Stats {

  /** A1: mean/std(pop)/min/max of `value` per group. */
  def statsPack(df: DataFrame, groupCols: Seq[String], value: Column,
                roundTo: Int = 4): DataFrame =
    df.groupBy(groupCols.map(col): _*).agg(
      round(avg(value), roundTo).as("mean"),
      round(stddev_pop(value), roundTo).as("std"),
      min(value).as("min"),
      max(value).as("max"))

  /** A4: mean IoU over classes with nonzero union. `inter`/`unionC` are 0/1
    * (or count) columns per observation row.
    */
  def meanIoU(df: DataFrame, classCol: Column, inter: Column, unionC: Column,
              roundTo: Int = 6): DataFrame =
    df.groupBy(classCol.as("class"))
      .agg(sum(inter).as("i"), sum(unionC).as("u"))
      .filter(col("u") > 0)
      .agg(round(avg(col("i") / col("u")), roundTo).as("miou"))

  /** A5: threshold fraction (PCK-style) per group. */
  def thresholdFraction(df: DataFrame, groupCols: Seq[String], measure: Column,
                        threshold: Double, roundTo: Int = 6): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(round(avg(when(measure < threshold, 1.0).otherwise(0.0)), roundTo)
        .as("frac_under"))

  /** A12: wide pivot with explicit values (no driver-side distinct scan) and
    * zero-filled counts so absent combinations are 0, not null.
    */
  def pivotCount(df: DataFrame, rowKey: String, pivotCol: String,
                 values: Seq[String]): DataFrame =
    df.groupBy(rowKey).pivot(pivotCol, values).count().na.fill(0L, values)
}
