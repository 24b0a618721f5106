package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-construction planners: tiny aggregates that turn per-source /
  * per-language statistics into sampling fractions, mixture weights, and
  * packing layouts. All driver-free — outputs are DataFrames whose row
  * counts equal the number of sources/windows, never the corpus size, so
  * each plan is a broadcast-sized artifact at any corpus scale.
  */
object Planners {

  /** Token-budget mixture: per-source sampling fractions that hit target
    * shares of the total token budget. Input must have
    * (source, src_tokens, w); a source smaller than its target share is
    * taken whole (fraction capped at 1 — the remaining deficit is a
    * reweighting decision, not silently shifted to other sources).
    * Output: (source, src_tokens, target_share, fraction).
    */
  def tokenBudgetMixture(per: DataFrame, roundTo: Int = 6): DataFrame = {
    val tot = per.agg(sum(col("src_tokens")).as("total_tokens"),
      sum(col("w")).as("total_w"))
    per.crossJoin(broadcast(tot))
      .withColumn("target_share", round(col("w") / col("total_w"), roundTo))
      .withColumn("fraction", round(least(lit(1.0),
        (col("w") / col("total_w")) * col("total_tokens") / col("src_tokens")),
        roundTo))
      .select(col("source"), col("src_tokens"), col("target_share"),
        col("fraction"))
  }

  /** Temperature-scaled mixture: p_g ∝ n_g^alpha over the `group` column's
    * per-group counts (alpha = 1/T; alpha < 1 upweights low-resource
    * groups), plus a floor(budget · p) allocation. alpha = 0.5 uses
    * `sqrt` — `pow(x, 0.5)` is not guaranteed bit-identical to `sqrt(x)`,
    * and the oracle uses sqrt. The allocation floors a ROUNDED quotient:
    * an ulp difference in the normalizer accumulation order must not flip
    * the result at an integer boundary.
    * Input: one row per group with a count column. Output:
    * (group, nCol, p_temp, alloc).
    */
  def temperatureMixture(per: DataFrame, group: String, nCol: String,
                         alpha: Double, budget: Long,
                         roundTo: Int = 6): DataFrame = {
    def wgt(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else pow(c, alpha)
    val z = per.agg(sum(wgt(col(nCol))).as("z"))
    per.crossJoin(broadcast(z))
      .withColumn("p_temp", round(wgt(col(nCol)) / col("z"), roundTo))
      .withColumn("alloc",
        floor(round(lit(budget.toDouble) * wgt(col(nCol)) / col("z"), roundTo))
          .cast("long"))
      .select(col(group), col(nCol), col("p_temp"), col("alloc"))
  }

  /** Concatenate-then-chunk pack plan: assigns each document to the
    * fixed-budget token window its FIRST token falls in under GPT-style
    * packing (seq = floor(tokens-before / budget), per group, in the
    * deterministic `order`). Documents straddle window boundaries, so a
    * window's whole-doc token total can exceed the budget by up to one
    * straddling doc — the chunker splits it; this plan counts it where it
    * starts. NOT first-fit-with-reset (that needs a sequential fold).
    * Input: one row per doc with a token-count column. Output:
    * (group, seq, n_docs, seq_tokens).
    */
  def packPlan(docs: DataFrame, group: String, order: String, nTok: String,
               budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col(order))
    docs
      .withColumn("seq",
        floor((sum(col(nTok)).over(w) - col(nTok)) / lit(budget.toDouble))
          .cast("long"))
      .groupBy(col(group), col("seq"))
      .agg(count(lit(1)).as("n_docs"), sum(col(nTok)).as("seq_tokens"))
  }
}
