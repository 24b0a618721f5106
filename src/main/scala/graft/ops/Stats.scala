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

  /** Native sequential-sum dot product ([[graft.functions.DotProductExpr]])
    * — the same kernel the ANN path uses; summation order matches DuckDB's
    * list_dot_product bit-for-bit (VectorsSpec), which keeps the metric
    * kernels below oracle-checkable.
    */
  private def dotp(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.DotProductExpr(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  }

  /** A14a: mean squared error between two equal-length double arrays via
    * the dot decomposition sum((a−b)²) = a·a − 2·a·b + b·b — three codegen'd
    * sequential-sum kernels instead of a zip_with fold (HOF lambdas are
    * CodegenFallback; the kernels stay in codegen AND match the oracle's
    * list_dot_product exactly).
    */
  def arrayMse(a: Column, b: Column): Column =
    (dotp(a, a) - lit(2.0) * dotp(a, b) + dotp(b, b)) / size(a).cast("double")

  /** A14: peak signal-to-noise ratio, 10·log10(MAX²/MSE) (reference
    * common/metrics.py:123-140 — the pure-math metric; the model-backed
    * ones stay out-of-engine per SURVEY §7.5). A perfect reconstruction
    * (MSE = 0) is +Infinity, stated explicitly because ANSI mode makes the
    * bare division throw instead of yielding inf.
    */
  def psnr(a: Column, b: Column, maxVal: Double = 1.0): Column = {
    val mse = arrayMse(a, b)
    when(mse === 0.0, lit(Double.PositiveInfinity))
      .otherwise(lit(10.0) * log10(lit(maxVal * maxVal) / mse))
  }

  /** A15: windowless ("global") SSIM over an array pair — the single-window
    * degenerate case of SSIM (reference common/metrics.py:142-221): means,
    * population variances and covariance over the WHOLE array, Wang et al.
    * stabilizers C1=(0.01·L)², C2=(0.03·L)². The sliding-window variant is
    * this expression mapped over patch arrays; the statistics are sums and
    * dot products, so it stays a pure column expression (no UDF).
    */
  def ssimLite(a: Column, b: Column, maxVal: Double = 1.0): Column = {
    val c1 = lit(0.0001 * maxVal * maxVal)
    val c2 = lit(0.0009 * maxVal * maxVal)
    val n = size(a).cast("double")
    val ma = aggregate(a, lit(0.0), _ + _) / n
    val mb = aggregate(b, lit(0.0), _ + _) / n
    val va = dotp(a, a) / n - ma * ma
    val vb = dotp(b, b) / n - mb * mb
    val cov = dotp(a, b) / n - ma * mb
    ((lit(2.0) * ma * mb + c1) * (lit(2.0) * cov + c2)) /
      ((ma * ma + mb * mb + c1) * (va + vb + c2))
  }

  /** A12: wide pivot with explicit values (no driver-side distinct scan) and
    * zero-filled counts so absent combinations are 0, not null.
    */
  def pivotCount(df: DataFrame, rowKey: String, pivotCol: String,
                 values: Seq[String]): DataFrame =
    df.groupBy(rowKey).pivot(pivotCol, values).count().na.fill(0L, values)

  /** A13: exact linear-interpolated percentiles per group (the semantics of
    * Spark's `percentile` and DuckDB's `quantile_cont`: 0-based position
    * pos = p·(n−1), result = v[⌊pos⌋]·(1−frac) + v[⌊pos⌋+1]·frac).
    *
    * Computed as one window SORT + one hash aggregate instead of the
    * built-in `percentile` aggregate: that aggregate buffers a value→count
    * OpenHashMap per group on the reduce task with no spill path, so a
    * group with high value cardinality (the 100-TB case — think billions of
    * distinct prices under one flag) is an executor OOM. A window sort runs
    * through Spark's external sorter and spills; memory stays bounded
    * regardless of group size. All requested percentiles share the single
    * sort. Null VALUES are excluded but their groups are kept (NULL
    * percentiles for an all-null group) — exactly the built-ins' contract.
    *
    * `ps` maps output column name → percentile in [0,1].
    */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String], value: Column,
                       ps: Seq[(String, Double)], roundTo: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    // project first: working names __v/__rn/__n must not collide with input
    val projected = df.select(gs :+ value.cast("double").as("__v"): _*)
    val base = projected
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(Window.partitionBy(gs: _*).orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(gs: _*)))
    val aggs = ps.map { case (name, p) =>
      val pos  = (col("__n") - 1) * lit(p) // 0-based fractional rank
      val flo  = floor(pos)
      val frac = pos - flo
      // each row contributes only if it sits at ⌊pos⌋ or ⌊pos⌋+1 (1-based
      // rn = ⌊pos⌋+1 / ⌊pos⌋+2); everything else is null and sum skips it
      round(sum(
        when(col("__rn") === flo + 1, col("__v") * (lit(1.0) - frac))
          .when(col("__rn") === flo + 2 && frac > 0, col("__v") * frac)),
        roundTo).as(name)
    }
    val computed = base.groupBy(gs: _*).agg(aggs.head, aggs.tail: _*)
    // an all-null group has no surviving rows above — re-attach such groups
    // with NULL percentiles so the output keeps one row per input group,
    // like percentile()/quantile_cont do
    projected.select(gs: _*).distinct()
      .join(computed, groupCols, "left")
  }
}
