package graft.text

import graft.text.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine BPE tokenizer TRAINING (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — learn the top-k
  * byte-pair merges from the corpus, then segment documents with them:
  * the tokenizer-learning step a training-data pipeline runs before token
  * counting, packing, and budget planning are meaningful in model units
  * (the tx_bpe_tokens regex is a FIXED approximation; this learns the
  * vocabulary from the data).
  *
  * The reference pipeline tokenizes with a pretrained CLIP tokenizer
  * (reference: train/common/dataset.py — fixed vocab, no learning); this
  * is part of the LLM-curation surface the brief adds on top.
  *
  * Scale shape (100 TB) — the Sennrich word-frequency trick: training
  * never touches the corpus after ONE (word, freq) aggregation (one
  * corpus-sized shuffle, output vocabulary-sized). Each of the k merge
  * rounds is then a vocab-sized pair-count aggregate + a one-row argmax
  * broadcast cross + a map-side string replace, materialized per round
  * (the tx_classifier discipline — inlining k rounds of replaces would
  * explode the plan). Segmenting the corpus afterwards is one equi-join
  * of exploded tokens against the (word → n_subwords) vocabulary — the
  * segmentation of each DISTINCT word is computed exactly once, never
  * per occurrence.
  *
  * Practical depth boundary (measured, SURVEY §6.3 bpe): each merge round
  * is one aggregate job + one materialization job, driver-sequenced, so
  * per-round cost has a FIXED floor (~0.6 s on local[32] regardless of
  * vocab size at the probed tiers) on top of the vocab-linear work. That
  * makes in-engine training practical to k ≈ 1-4k merges (minutes); a
  * full 32k-merge production tokenizer at ~0.6 s/round is ~5-6 h of
  * driver-sequenced rounds — at that depth, export [[wordFreq]]'s
  * (word, freq) relation (the ONE corpus pass — vocabulary-sized, cheap
  * to ship) and train off-engine, then bring the merge table back for
  * [[docSubwordCounts]]. The engine's value is the corpus pass and the
  * corpus-scale application, not racing a single-process trainer through
  * 32k tiny rounds.
  *
  * Exactness contract (cross-engine oracle): the spaced-symbol form makes
  * greedy merge application a plain string replace with IDENTICAL
  * semantics in any engine. A word is `"  s1  s2  …  sk  "` (double-space
  * separators AND sentinels); merging pair (a, b) is
  * `replace(w, " a  b ", " ab ")`: each match consumes ONE space from
  * each side's double gap, so consecutive occurrences stay matchable and
  * one left-to-right non-overlapping replace IS exact greedy BPE
  * application ("b b b b b" → "bb bb b", asserted in BpeSpec). Argmax
  * ties break on the pair string ascending — deterministic everywhere.
  */
object Bpe {

  /** The (word, freq) vocabulary relation — the ONE corpus-sized pass. */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** `"hello"` → `"  h  e  l  l  o  "`: every symbol double-space
    * separated, double-space sentinels (see the replace contract above).
    */
  def spaced(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "))

  private def symsOf(w: Column): Column =
    filter(split(w, "  "), s => s =!= "")

  /** Learn up to `k` merges from a (word, freq) vocabulary.
    * Returns (merges, segmented vocabulary):
    *  - merges: (round, sym_a, sym_b, merged, cnt) — round 1..k, the
    *    merge table a tokenizer ships;
    *  - vocab:  (word, freq, w, n_syms) — each word's final spaced
    *    segmentation and subword count under all k merges.
    * Stops early (fewer than k rows) if a round has no pair left to
    * merge.
    *
    * Scale shape per ROUND (r13 verdict gap #3 — realistic merge counts,
    * probed at k=1024 in MaintProbe `bpe`, SURVEY §6.3): one vocab-sized
    * pair-count aggregate whose argmax row is COLLECTED (one row — the
    * winner was always driver-visible; the old one-row localCheckpoint +
    * broadcast-cross was two extra jobs per round), then one map-side
    * literal replace, then the vocab relation re-materializes. The merge
    * table itself accumulates on the driver (k rows) — the previous
    * k-way DataFrame union built a plan tree whose ANALYSIS cost grew
    * with k. Materialization: object blocks (localCheckpoint) at k ≤ 64
    * — measured faster for thin vocab relations — and columnar scratch
    * with eager previous-round reclaim above that, where k×vocab object
    * blocks would otherwise pin executor storage for the whole run.
    */
  def learnMerges(vocab: DataFrame, k: Int): (DataFrame, DataFrame) = {
    require(k >= 1 && k <= 32768,
      s"learnMerges: k must be in [1, 32768], got $k")
    val spark = vocab.sparkSession
    val scratchRounds = k > 64
    var prevHandle: Option[graft.core.Scratch.Handle] = None
    def materialize(df: DataFrame, round: Int): DataFrame =
      if (!scratchRounds) df.localCheckpoint(false)
      else {
        val (m, h) = graft.core.Scratch.materializeWithHandle(
          df, s"bpe_r$round")
        // round r-1's files are dead the moment round r is on disk
        prevHandle.foreach(_.drop())
        prevHandle = Some(h)
        m
      }
    var words = materialize(vocab
      .select(col("word"), col("freq"), spaced(col("word")).as("w")), 0)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val pairs = words
        .select(col("freq"), symsOf(col("w")).as("syms"))
        // guard single-symbol words: sequence(1, 0) walks BACKWARDS in
        // Spark and ANSI element_at would throw on the out-of-range index
        .select(col("freq"), explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => concat(element_at(col("syms"), i), lit(" "),
                element_at(col("syms"), i + 1))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .select(
          split(col("pair"), " ").getItem(0).as("sym_a"),
          split(col("pair"), " ").getItem(1).as("sym_b"),
          col("cnt"))
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, a + b, cnt))
        words = materialize(words
          .select(col("word"), col("freq"),
            call_function("replace", col("w"),
              lit(s" $a  $b "), lit(s" $a$b ")).as("w")), r)
        r += 1
      }
    }
    import spark.implicits._
    val mergeTable = merges.result()
      .toDF("round", "sym_a", "sym_b", "merged", "cnt")
    (mergeTable,
      words.withColumn("n_syms", size(symsOf(col("w"))).cast("long")))
  }

  /** Per-document subword counts under the learned merges: (doc_id,
    * n_tok, n_bpe). One explode + equi-join against the segmented
    * vocabulary (broadcast-sized next to the corpus) + one doc
    * aggregate — each distinct word segmented once, never per
    * occurrence.
    */
  def docSubwordCounts(docs: DataFrame, id: Column, text: Column,
                       segmentedVocab: DataFrame): DataFrame =
    docs.select(id.as("doc_id"), explode(tokens(text)).as("word"))
      .join(segmentedVocab.select(col("word"), col("n_syms")), Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tok"),
        sum("n_syms").as("n_bpe"))
}
