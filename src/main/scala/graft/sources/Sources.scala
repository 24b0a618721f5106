package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-file sources: the pairs / labels relations every reference
  * dataloader starts from (SURVEY S5).
  *
  * Reference behavior: read whole object, split lines, split on whitespace
  * → (person_id, garment_id) pairs (train/train_CATVTON/dataloader.py:35-49)
  * or (image_path, label) rows (train/train_DIT/dataloader.py:33-47).
  * Spark-first: a schema'd CSV read with explicit delimiter — the scan
  * parallelizes per file split, no driver-side line loop.
  */
object Sources {

  val pairsSchema: StructType = StructType(Seq(
    StructField("person_id", LongType), StructField("garment_id", LongType)))

  val labelsSchema: StructType = StructType(Seq(
    StructField("image_path", StringType), StructField("label", IntegerType)))

  /** S5: space-delimited pairs file → (person_id, garment_id). */
  def readPairs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(pairsSchema).option("delimiter", " ").csv(path)

  /** S5: space-delimited labels file → (image_path, label). */
  def readLabels(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(labelsSchema).option("delimiter", " ").csv(path)

  /** Write a pairs relation as the reference's train_pairs.txt layout
    * (space-delimited, no header). Used by fixtures and the Sync pipeline.
    */
  def writePairs(pairs: DataFrame, path: String): Unit =
    // repartition(1) + sortWithinPartitions: one sorted file. (orderBy
    // after coalesce(1) would re-shuffle and fan back out; coalesce after
    // orderBy would collapse the sort itself to one task.)
    pairs.repartition(1).sortWithinPartitions(pairs.columns.toIndexedSeq.map(col): _*)
      .write.mode("overwrite").option("delimiter", " ").csv(path)
}
