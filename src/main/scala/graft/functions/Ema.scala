package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** Order-sensitive exponential moving average — the one genuinely custom
  * aggregate in the engine (SURVEY A7/U5).
  *
  * Reference semantics (reference: train/train_DIT/utils.py:19-25):
  *   ema_1 = x_1;  ema_t = (1 - decay) * x_t + decay * ema_{t-1}
  * over step-ordered values within a group.
  *
  * Spark aggregation is unordered, so the [[Aggregator]] buffers (step, value)
  * pairs and sorts at finish — correct under any partial-aggregation /
  * merge order, suitable for bounded-size groups (per-run training metrics).
  * For unbounded groups use [[Ema.sortedFold]], which shuffles once on the
  * group key, sorts within partitions, and folds sequentially — the
  * constant-memory scale path.
  */
class EmaAggregator(decay: Double)
    extends Aggregator[(Long, Double), ArrayBuffer[(Long, Double)], Double] {

  override def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty

  import EmaAggregator.MaxBufferedRows

  private def guard(b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    if (b.length > MaxBufferedRows) throw new IllegalStateException(
      s"EmaAggregator buffered > $MaxBufferedRows rows in one group; " +
        "this aggregator is for bounded groups (per-run training metrics). " +
        "Use Ema.closedForm (window) or Ema.sortedFold (streaming fold) " +
        "for unbounded groups.")
    b
  }

  override def reduce(b: ArrayBuffer[(Long, Double)], a: (Long, Double)): ArrayBuffer[(Long, Double)] = {
    b += a; guard(b)
  }

  override def merge(b1: ArrayBuffer[(Long, Double)], b2: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    b1 ++= b2; guard(b1)
  }

  override def finish(b: ArrayBuffer[(Long, Double)]): Double =
    if (b.isEmpty) Double.NaN
    else {
      val s = b.sortBy(_._1)
      s.tail.foldLeft(s.head._2) { case (ema, (_, x)) => (1 - decay) * x + decay * ema }
    }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Double)]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object EmaAggregator {
  /** Hard per-group buffer cap (~64 MB of pairs): fail loudly instead of
    * OOMing an executor when someone points the buffering Aggregator at an
    * unbounded group.
    */
  val MaxBufferedRows: Int = 1 << 22
}

object Ema {

  /** Column form: `ema(decay)(stepCol, valueCol)` usable in `agg(...)`. */
  def ema(decay: Double): (Column, Column) => Column = {
    val fn = udaf(new EmaAggregator(decay))
    (step, value) => fn(step, value)
  }

  /** Closed-form EMA — the 100-TB path. The recurrence
    *   ema_n = decay^(n-1) * x_1 + Σ_{t=2..n} (1-decay) * decay^(n-t) * x_t
    * is a plain weighted sum once each row knows its step rank and the
    * group size, so one window (rank + count) + one hash-aggregate computes
    * it entirely inside whole-stage codegen: no UDAF, no buffering, no
    * mapGroups. Output: group cols + `ema`.
    */
  def closedForm(df: DataFrame, group: String, step: String, value: String,
                 decay: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(group).orderBy(step)
    // Project down to the three input columns first: the working names
    // __rn/__n must not collide with caller columns, and the output is
    // (group, ema) anyway so nothing else is needed.
    df.select(col(group), col(step), col(value))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(group)))
      .groupBy(group)
      .agg(sum(
        when(col("__rn") === 1, pow(lit(decay), col("__n") - 1) * col(value))
          .otherwise(lit(1 - decay) * pow(lit(decay), col("__n") - col("__rn")) * col(value)))
        .as("ema"))
  }

  /** Scale path: one shuffle on the group key + Tungsten external sort
    * within partitions (spills to disk, never materializes a group in
    * memory) + a single streaming fold over the sorted iterator. Truly
    * constant-memory per group — the secondary sort happens in the engine,
    * not in user code.
    * Input columns: (group: Long, step: Long, value: Double).
    * Output columns: (group, ema).
    */
  def sortedFold(df: DataFrame, group: String, step: String, value: String,
                 decay: Double): DataFrame = {
    import df.sparkSession.implicits._
    df.select(df(group).cast("long").as("g"), df(step).cast("long").as("s"),
        df(value).cast("double").as("v"))
      .repartition(org.apache.spark.sql.functions.col("g"))
      .sortWithinPartitions("g", "s")
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        // Rows arrive grouped by g and step-sorted within each group;
        // fold sequentially, emitting on every group boundary.
        new Iterator[(Long, Double)] {
          private var pending: Option[(Long, Long, Double)] = None
          def hasNext: Boolean = pending.isDefined || it.hasNext
          def next(): (Long, Double) = {
            var (g, _, ema) = pending.getOrElse(it.next())
            pending = None
            var done = false
            while (!done && it.hasNext) {
              val row = it.next()
              if (row._1 == g) ema = (1 - decay) * row._3 + decay * ema
              else { pending = Some(row); done = true }
            }
            (g, ema)
          }
        }
      }
      .toDF(group, "ema")
  }
}
