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

  override def reduce(b: ArrayBuffer[(Long, Double)], a: (Long, Double)): ArrayBuffer[(Long, Double)] = {
    b += a; b
  }

  override def merge(b1: ArrayBuffer[(Long, Double)], b2: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    b1 ++= b2; b1
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

object Ema {

  /** Column form: `ema(decay)(stepCol, valueCol)` usable in `agg(...)`. */
  def ema(decay: Double): (Column, Column) => Column = {
    val fn = udaf(new EmaAggregator(decay))
    (step, value) => fn(step, value)
  }

  /** Scale path: one shuffle + in-partition sort + sequential fold.
    * Input columns: (group: Long, step: Long, value: Double).
    * Output columns: (group, ema).
    */
  def sortedFold(df: DataFrame, group: String, step: String, value: String,
                 decay: Double): DataFrame = {
    import df.sparkSession.implicits._
    df.select(df(group).cast("long"), df(step).cast("long"), df(value).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (g, it) =>
        val s = it.toArray.sortBy(_._2)
        val e = s.tail.foldLeft(s.head._3) { case (ema, (_, _, x)) => (1 - decay) * x + decay * ema }
        (g, e)
      }
      .toDF(group, "ema")
  }
}
