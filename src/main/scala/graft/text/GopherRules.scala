package graft.text

import graft.text.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style per-rule quality filtering (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * Appendix A1.1) — the RULE-LEVEL complement of
  * [[TextFunctions.qualityScore]]'s composite score: each document gets a
  * named boolean per rule plus the composite `keep`, and [[ruleFunnel]]
  * reports what each rule actually costs (marginal and sole-fail doc
  * counts) — the audit a curation reviewer reads before adopting a gate,
  * the no-silent-caps rule applied to quality filtering itself.
  *
  * The reference pipeline has no document-quality pass (it trains on a
  * fixed curated set, reference: train/common/dataset.py); this is part of
  * the LLM-curation surface the brief adds on top.
  *
  * Exactness contract: every threshold is an EXACT INTEGER comparison —
  * `mean word length ≥ 3` is tested as `sum_len ≥ 3·n_tok`, `top-token
  * fraction ≤ 1/10` as `10·top_cnt ≤ n_tok`, and so on — so no float
  * rounding can flip a flag between engines. Rule set (default [[Bounds]]
  * adapted to this corpus's 10-99-token documents; Gopher's own would be
  * `Bounds(minTokens = 50, maxTokens = 100000)` — every threshold is
  * caller-configurable, ratios as exact (num, den) pairs):
  *
  *  - `r_wc`:    token count in [20, 80]
  *  - `r_mwl`:   mean token length in [3, 10]  (sum_len vs 3n / 10n)
  *  - `r_alpha`: ≥ 80% of tokens contain an alphabetic character
  *  - `r_stop`:  ≥ 2 distinct stopwords from a fixed 8-word list
  *  - `r_top`:   most frequent token ≤ 1/10 of all tokens
  *  - `r_dup`:   duplicate-token fraction ≤ 1/2  (Gopher's repetition axis)
  *
  * Scale shape (100 TB): [[ruleFlags]] is a MAP-ONLY pass — every signal
  * including the top-token count comes from per-row array folds (the
  * multiplicity count is a linear run-length fold over the doc's SORTED
  * token array, never an explode), so the gate costs one corpus scan with
  * NO shuffle (asserted in GopherRulesSpec). [[ruleFunnel]] adds one
  * 6-row aggregate on top. Zero-token documents pass the ratio rules
  * vacuously (0 ≥ 0) and are dropped by `r_wc` — `keep` is still false.
  */
object GopherRules {

  /** The fixed stopword list `r_stop` draws from (engine policy). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "that")

  /** Rule thresholds, all exact-integer: ratios are (num, den) pairs
    * compared cross-multiplied so no float can flip a flag. Defaults are
    * the corpus-adapted bounds the tx_gopher_* oracles pin; Gopher's own
    * paper values would be e.g. `Bounds(minTokens = 50, maxTokens =
    * 100000)`.
    */
  final case class Bounds(
      minTokens: Long = 20, maxTokens: Long = 80,
      minMeanLen: Long = 3, maxMeanLen: Long = 10,
      minAlphaFrac: (Long, Long) = (4L, 5L), // ≥ 4/5 of tokens alphabetic
      minStopwords: Long = 2,
      maxTopFrac: (Long, Long) = (1L, 10L),  // top token ≤ 1/10 of tokens
      maxDupFrac: (Long, Long) = (1L, 2L))   // dup fraction ≤ 1/2

  /** Largest per-token multiplicity in a token array: sort, then one
    * linear fold tracking (prev, current run, best run) — equal tokens
    * are adjacent after the sort, so the longest run IS the top count.
    * Map-side only; no explode, no shuffle.
    */
  def topTokenCount(toks: Column): Column =
    aggregate(
      sort_array(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  // signal builders over a token-array column (bound attribute OR lambda
  // variable) and the rule comparisons over the signals — ONE set of
  // arithmetic shared by ruleFlags and keepExpr, so the view and the
  // pipeline gate cannot drift (parity asserted in GopherRulesSpec)
  private def sumLenOf(toks: Column): Column =
    aggregate(toks, lit(0L), (a, t) => a + length(t))
  // \p{L}, not [a-z]: under the r17 Unicode token form an "alphabetic"
  // word must count in every script, or r_alpha would fail all CJK/
  // Cyrillic/Arabic documents wholesale
  private def nAlphaOf(toks: Column): Column =
    size(filter(toks, t => t.rlike("\\p{L}"))).cast("long")
  private def nStopOf(toks: Column): Column =
    size(array_intersect(array_distinct(toks),
      array(Stopwords.map(lit): _*))).cast("long")
  private def rWc(b: Bounds)(nTok: Column) =
    nTok >= b.minTokens && nTok <= b.maxTokens
  private def rMwl(b: Bounds)(nTok: Column, sumLen: Column) =
    sumLen >= nTok * b.minMeanLen && sumLen <= nTok * b.maxMeanLen
  private def rAlpha(b: Bounds)(nTok: Column, nAlpha: Column) =
    nAlpha * b.minAlphaFrac._2 >= nTok * b.minAlphaFrac._1
  private def rStop(b: Bounds)(nStop: Column) = nStop >= b.minStopwords
  private def rTop(b: Bounds)(nTok: Column, topCnt: Column) =
    topCnt * b.maxTopFrac._2 <= nTok * b.maxTopFrac._1
  private def rDup(b: Bounds)(nTok: Column, nDistinct: Column) =
    (nTok - nDistinct) * b.maxDupFrac._2 <= nTok * b.maxDupFrac._1

  /** Per-document rule flags: (doc_id, n_tok, r_wc, r_mwl, r_alpha,
    * r_stop, r_top, r_dup, keep). One map-only corpus pass.
    */
  def ruleFlags(docs: DataFrame, id: Column, text: Column,
                bounds: Bounds = Bounds()): DataFrame =
    docs
      .select(id.as("doc_id"), tokens(text).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        sumLenOf(col("toks")).as("sum_len"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        nAlphaOf(col("toks")).as("n_alpha"),
        nStopOf(col("toks")).as("n_stop"),
        topTokenCount(col("toks")).as("top_cnt"))
      .select(col("doc_id"), col("n_tok"),
        rWc(bounds)(col("n_tok")).as("r_wc"),
        rMwl(bounds)(col("n_tok"), col("sum_len")).as("r_mwl"),
        rAlpha(bounds)(col("n_tok"), col("n_alpha")).as("r_alpha"),
        rStop(bounds)(col("n_stop")).as("r_stop"),
        rTop(bounds)(col("n_tok"), col("top_cnt")).as("r_top"),
        rDup(bounds)(col("n_tok"), col("n_distinct")).as("r_dup"))
      .withColumn("keep",
        col("r_wc") && col("r_mwl") && col("r_alpha") &&
          col("r_stop") && col("r_top") && col("r_dup"))

  /** The composite keep as ONE boolean expression over raw text — the
    * form a pipeline filter wants ([[graft.pipelines.Pipelines]]
    * dedupCorpus `gopherGate`). The token array is let-bound via a
    * single-element `transform`, so tokenization runs ONCE per row no
    * matter how many rules read it (a lambda variable, unlike a
    * projected alias, cannot be inlined apart by the optimizer).
    * Identical decisions to [[ruleFlags]]' `keep` by construction
    * (shared rule builders) and by assertion (GopherRulesSpec).
    */
  def keepExpr(text: Column, bounds: Bounds = Bounds()): Column =
    element_at(
      transform(array(tokens(text)), toks => {
        val nTok = size(toks).cast("long")
        rWc(bounds)(nTok) &&
          rMwl(bounds)(nTok, sumLenOf(toks)) &&
          rAlpha(bounds)(nTok, nAlphaOf(toks)) &&
          rStop(bounds)(nStopOf(toks)) &&
          rTop(bounds)(nTok, topTokenCount(toks)) &&
          rDup(bounds)(nTok, size(array_distinct(toks)).cast("long"))
      }),
      1)

  private val RuleNames =
    Seq("r_wc", "r_mwl", "r_alpha", "r_stop", "r_top", "r_dup")

  /** The rule-cost audit over [[ruleFlags]] output: one row per rule with
    * `n_fail` (documents the rule rejects at all) and `n_sole_fail`
    * (documents ONLY this rule rejects — what waiving it would recover).
    * 6-row output at any corpus scale; one explode×6 + aggregate.
    */
  def ruleFunnel(flags: DataFrame): DataFrame = {
    val nFails = RuleNames
      .map(r => when(col(r), 0).otherwise(1))
      .reduce(_ + _)
    flags
      .withColumn("__nf", nFails)
      .select(explode(array(RuleNames.map(r =>
        struct(lit(r).as("rule"), (!col(r)).as("fail"),
          (!col(r) && col("__nf") === 1).as("sole"))): _*)).as("x"))
      .groupBy(col("x.rule").as("rule"))
      .agg(sum(when(col("x.fail"), 1L).otherwise(0L)).as("n_fail"),
        sum(when(col("x.sole"), 1L).otherwise(0L)).as("n_sole_fail"))
  }
}
