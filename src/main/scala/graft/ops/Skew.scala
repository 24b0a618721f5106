package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual fallbacks for when AQE's
  * runtime skew-join splitting (on by default, GraftSession) isn't enough:
  * a power-law manifest (one S3 prefix holding half the corpus) or a
  * degenerate group key turns one shuffle partition into the straggler
  * that dominates the stage at 100 TB.
  *
  * WHEN TO SALT vs LEAN ON AQE (measured A/B, SURVEY §6.3: 7.5M fact
  * rows with half on one hot key, dim forced non-broadcast — AQE split
  * 1.5-1.6 s, AQE off 1.6-2.2 s, salted 2.1-2.6 s):
  *
  *  1. Default to AQE. It fixes the straggler at runtime for zero code
  *     and, in the measured A/B, beats salting — the salt pays a real
  *     tax (fact-side hash column + a `buckets`× replicated dim) on
  *     every row whether or not skew materializes.
  *  2. Salt when the skewed shuffle feeds an operator AQE's splitter
  *     does not cover: skewed AGGREGATION ([[saltedSum]] — AQE skew
  *     handling applies to sort-merge JOIN partitions, not groupBy
  *     aggregates), a skewed join under `spark.sql.shuffle.partitions`
  *     already at task-size limits, or a stage whose straggler is CPU
  *     (one task decompressing one giant key) rather than bytes — AQE's
  *     trigger is partition SIZE and misses byte-thin CPU-hot keys.
  *  3. Salt when determinism of the physical layout matters: AQE
  *     re-plans per run, so spill/locality behavior varies run to run;
  *     the [[Determinism.detHash]] salt gives an oracle-reproducible
  *     layout (x7/x8 are oracle-checked through the salted path).
  *  4. Broadcast beats both whenever the dim fits — always try that
  *     first; the A/B forces it off precisely because a broadcastable
  *     dim needs neither technique.
  *
  * Both helpers preserve exact semantics; salt only changes the shuffle
  * layout.
  */
object Skew {

  /** Two-phase salted aggregation: aggregate on (key, salt) first — the hot
    * key's rows spread over `buckets` reducers — then merge the partials on
    * the key alone (a tiny second shuffle: `buckets` rows per key).
    * `partials` maps each value column to its (partial, merge) aggregates;
    * for algebraic aggregates like count/sum they are (sum, sum) after the
    * first phase.
    *
    * Salt derives from [[Determinism.detHash]] of a row id — deterministic,
    * shuffle-safe, oracle-reproducible, unlike `rand()`-based salting.
    */
  def saltedSum(df: DataFrame, key: Column, rowId: Column, value: Column,
                buckets: Int): DataFrame =
    df.withColumn("__salt", Determinism.detHash(rowId) % buckets)
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy("key")
      .agg(sum("__psum").as("sum"), sum("__pcnt").as("cnt"))

  /** Salted join of a skewed fact side against a dimension: the fact side
    * gets a deterministic salt in [0, buckets); the dimension is replicated
    * `buckets` times (explode of a literal range — fine for dimension
    * tables, which are small by definition) so every (key, salt) pair finds
    * its match. Equi-join on (key, salt) spreads each hot key over
    * `buckets` tasks. Exact same rows as the unsalted join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, rowId: Column,
                 buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      (Determinism.detHash(rowId) % buckets).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
