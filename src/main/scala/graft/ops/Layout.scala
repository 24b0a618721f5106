package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan locality: a Z-order (Morton) key
  * interleaves the bits of two dimension columns so rows close in BOTH
  * dimensions land in the same file/row-group — the multi-column min/max
  * pruning layout (the `OPTIMIZE ZORDER BY` idea) for 100-TB parquet:
  * cluster once, then every selective filter on either dimension skips
  * most files on footer statistics alone.
  *
  * The z-value is pure integer arithmetic (shift/mask/add per bit), fully
  * codegen'd and bit-identical in ANSI SQL — no UDF, oracle-reproducible.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of x (even positions) and y
    * (odd positions). bits ≤ 31 keeps the result in a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)

  /** The matching DuckDB fragment (same shifts, same masks). */
  def zValueSql(xExpr: String, yExpr: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((CAST($xExpr AS BIGINT) >> $i) & 1) << ${2 * i}) + " +
        s"(((CAST($yExpr AS BIGINT) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Cluster a relation for writing: range-partition on the z-key (each
    * output file covers a compact z-interval = a rectangle-ish region of
    * the (x, y) space), sort within partitions so row-group stats are
    * tight. `numFiles` ≙ target output files.
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column, numFiles: Int,
                 bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("__z", zValue(x, y, bits))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Hive-style partitioned layout: one directory per distinct value of
    * `partCol` (`dir/partCol=value/part-*.parquet`). A query filtering on
    * the partition column prunes whole directories at PLANNING time
    * (`PartitionFilters` in the scan) — files of non-matching partitions
    * are never listed into the scan, the coarse-grained complement of
    * [[clusterByZ]]'s intra-file row-group pruning. At 100 TB this is the
    * difference between touching one date's worth of data and listing the
    * entire lake; keep partition cardinality bounded (dates, categories —
    * not keys) so directory count stays manageable.
    */
  def writePartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(dir)
}
