package graft.queries

import graft.core.Tables
import graft.ops.TopK
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / sort / limit / top-k queries (SURVEY §2.5). */
object QWindows {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1/W2: latest-wins per group with pinned tie-break
    // (reference train/common/checkpoint_utils.py:25-51).
    "w1_latest_per_group" -> ((s, d) =>
      TopK.latestPerGroup(t(s, d, "orders"), Seq(col("o_custkey")),
        col("o_orderdate"), col("o_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))),

    // W3: max by regex-extracted number (train/train_stage_1/utils.py:41-51).
    "w3_max_by_regex" -> ((s, d) =>
      TopK.maxByExtractedNumber(t(s, d, "customer"), Seq(col("c_mktsegment")),
        col("c_name"), "#(\\d+)")
        .select(col("c_mktsegment"), col("c_name"))),

    // W4/W7: deterministic sort + head-N (train/common/examples.py:216).
    "w7_head_n" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // W6: top-k per group (first-match pick generalized).
    "w6_topk_per_group" -> ((s, d) =>
      TopK.topKPerGroup(t(s, d, "orders"), Seq(col("o_custkey")),
        col("o_totalprice"), col("o_orderkey"), 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))),

    // W9: cross-validation fold assignment — exact equal-size folds per
    // stratum via ntile over the deterministic-hash order (the ML-side
    // train/val split as a relational op; hash order makes folds
    // reproducible across runs/engines). Window parallelism = #strata;
    // for stratum-outgrows-one-task scale, derive the fold from the
    // distributed rank (Sampling.stratifiedExactDistributed's layout)
    // as floor(rank * k / n).
    "w9_ntile_folds" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(5).over(Window.partitionBy(col("o_orderpriority"))
          .orderBy(graft.ops.Determinism.detHash(col("o_orderkey")), col("o_orderkey")))
          .as("fold"))),

    // W10: percentile-based quality pruning — "drop the bottom 80% per
    // language by quality score" (n_chars as the deterministic score
    // proxy) via percent_rank over a pinned total order. The rank is
    // rounded BEFORE the threshold filter in both engines, so the 0.8
    // boundary decision is identical. partitionBy(lang) caps parallelism
    // at the language count — for a global/per-stratum rank at 100 TB use
    // Sampling.stratifiedExactDistributed's range-repartition rank shape.
    "w10_quality_prune" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
      t(s, d, "documents")
        .withColumn("pr", round(percent_rank().over(w), 6))
        .filter(col("pr") >= 0.8)
        .select(col("doc_id"), col("lang"), col("pr"))
    }),

    // W8: frame specs — running sum, lag, rank.
    "w8_frames" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("running_total"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate")))
          .as("date_rank"))
    }))

  def oracle: Map[String, String] = Map(
    "w1_latest_per_group" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn = 1""",
    "w3_max_by_regex" ->
      """SELECT c_mktsegment, c_name FROM (
           SELECT c_mktsegment, c_name,
                  row_number() OVER (PARTITION BY c_mktsegment
                    ORDER BY CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) DESC,
                             c_name DESC) AS rn
           FROM customer) WHERE rn = 1""",
    "w7_head_n" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    "w6_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
           FROM orders) WHERE rk <= 3""",
    "w9_ntile_folds" -> {
      val h = graft.ops.Determinism.detHashSql("o_orderkey")
      s"""SELECT o_orderkey, o_orderpriority,
                 CAST(ntile(5) OVER (PARTITION BY o_orderpriority
                   ORDER BY $h, o_orderkey) AS INT) AS fold
          FROM orders"""
    },
    "w10_quality_prune" ->
      """WITH r AS (
           SELECT doc_id, lang,
                  round(percent_rank() OVER (PARTITION BY lang
                    ORDER BY n_chars, doc_id), 6) AS pr
           FROM documents)
         SELECT doc_id, lang, pr FROM r WHERE pr >= 0.8""",
    "w8_frames" ->
      """SELECT o_custkey, o_orderkey,
                round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
                lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS prev_price,
                CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS INT) AS date_rank
         FROM orders""")
}
