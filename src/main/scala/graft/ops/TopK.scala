package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins / top-1 / top-k queries (SURVEY §2.5).
  *
  * Reference semantics: latest checkpoint by S3 LastModified or local mtime
  * (reference: train/common/checkpoint_utils.py:25-51,67-83), max step number
  * extracted by regex (reference: train/train_stage_1/utils.py:41-51),
  * `ls -t | head -1` in bash drivers.
  *
  * Tie-breaks are always pinned on a unique key (SURVEY §7.4: "pinned
  * tie-breaks on top-1/latest-wins queries") so results hash-match an oracle.
  *
  * Scale: `row_number` over a partitioned window is a single shuffle on the
  * group key and streams within each partition; for global top-k use
  * `orderBy(...).limit(k)` which Spark executes as per-partition top-k +
  * driver merge (TakeOrderedAndProject), not a total sort.
  */
object TopK {

  /** W1/W2: one row per group — the latest by `ts`, ties broken by `tieBreak`
    * descending.
    */
  def latestPerGroup(df: DataFrame, group: Seq[Column], ts: Column,
                     tieBreak: Column): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(group: _*).orderBy(ts.desc, tieBreak.desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** W3: max-by-a-regex-extracted number per group. */
  def maxByExtractedNumber(df: DataFrame, group: Seq[Column], source: Column,
                           pattern: String): DataFrame = {
    val num = regexp_extract(source, pattern, 1).cast("long")
    latestPerGroup(df.withColumn("__num", num), group, col("__num"), source)
      .drop("__num")
  }

  /** Top-k per group by `order` descending, pinned tie-break ascending. */
  def topKPerGroup(df: DataFrame, group: Seq[Column], order: Column,
                   tieBreak: Column, k: Int): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(group: _*).orderBy(order.desc, tieBreak.asc)))
      .filter(col("__rn") <= k)
      .withColumnRenamed("__rn", "rk")
}
