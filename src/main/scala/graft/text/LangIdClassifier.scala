package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED language identification — the fastText-style replacement for
  * the [[TextFunctions.langId]] stopword-marker heuristic (r13 verdict
  * gap #2): a one-vs-rest logistic classifier over hashed character
  * trigram frequencies, trained in-engine on a labeled seed by the same
  * fixed-point gradient-descent machinery as the quality classifier
  * ([[QualityClassifier.logisticTrainOn]]), so the WHOLE trainer +
  * predictor sits under a DuckDB oracle (tx_langid_trained).
  *
  * The reference has no language-ID at all (its corpus is homogeneous);
  * this is part of the multilingual-curation surface the LLM-pipeline
  * mandate adds (CCNet trains exactly this shape: char-n-gram features,
  * linear heads per language).
  *
  * Feature hashing is engine-portable by construction: bucket(g) =
  * (cp(g₁)·961 + cp(g₂)·31 + cp(g₃)) mod k over the trigram's code
  * points — `ascii()` returns the first character's code point in both
  * Spark and DuckDB, so no engine-specific hash is involved. Prediction
  * compares per-language probabilities ROUNDED to 6dp (ties broken by
  * language code ascending), so cross-engine argmax agreement needs only
  * 6dp agreement of σ — the same exp() tolerance the quality classifier
  * already relies on.
  *
  * Scale shape (100 TB): the feature projection is map-only (k+1
  * higher-order-function passes over the per-doc gram array — no
  * shuffle, no UDF); training pays that projection ONCE into columnar
  * scratch and then runs langs × iters thin aggregate passes (each a
  * map-side-combining sum of k+1 longs); prediction is a pure
  * whole-stage projection. Train on a seed, score everything.
  */
object LangIdClassifier {

  /** bias + k hashed char-trigram bucket frequencies, each rounded to
    * 6dp (the [[QualityClassifier.features]] contract). Trigrams shorter
    * than 3 chars (the tail of [[TextFunctions.charNgrams]] on short
    * texts) are dropped; a doc with no full trigram gets all-zero
    * frequencies and rides on the bias alone.
    */
  def bucketFeatures(text: Column, k: Int = 12): Seq[Column] = {
    val grams = filter(TextFunctions.charNgrams(text, 3),
      g => length(g) === 3)
    val total = size(grams)
    lit(1.0) +: (0 until k).map { j =>
      round(when(total > 0,
        size(filter(grams, g => bucket(g, k) === j)).cast("double") /
          total)
        .otherwise(0.0), 6)
    }
  }

  private def bucket(g: Column, k: Int): Column =
    (ascii(substring(g, 1, 1)).cast("long") * 961 +
      ascii(substring(g, 2, 1)).cast("long") * 31 +
      ascii(substring(g, 3, 1)).cast("long")) % k

  /** Train one logistic head per language (one-vs-rest) on `docs` with a
    * `lang` label column. Returns (language → weight vector) in `langs`
    * order — feed to [[predict]]. The feature relation (k+1 doubles + one
    * 0/1 label per language) is materialized to columnar scratch ONCE;
    * each head then runs `iters` thin aggregate passes against it.
    */
  def train(docs: DataFrame, text: Column, lang: Column,
            langs: Seq[String], k: Int = 12, iters: Int = 8,
            lr: Double = 8.0): Seq[(String, Array[Double])] = {
    require(langs.nonEmpty && langs.distinct == langs,
      s"train: langs must be non-empty and distinct, got $langs")
    val featCols = bucketFeatures(text, k)
    val f = graft.core.Scratch.materialize(
      docs.select(
        featCols.zipWithIndex.map { case (c, i) => c.as(s"__x$i") } ++
          langs.zipWithIndex.map { case (l, i) =>
            (lang === l).cast("double").as(s"__yc$i")
          }: _*),
      "langid_features")
    langs.zipWithIndex.map { case (l, i) =>
      l -> QualityClassifier.logisticTrainOn(
        f.select((0 to k).map(j => col(s"__x$j")) :+
          col(s"__yc$i").as("__y"): _*),
        k + 1, iters, lr)
    }
  }

  /** Score `docs` under the trained heads: input columns + one
    * `p_<lang>` = round(σ(x·w_lang), 6) per language + `predicted` =
    * argmax over the ROUNDED probabilities, ties broken by `models`
    * order (pass languages sorted). A pure projection — no shuffle.
    */
  def predict(docs: DataFrame, text: Column,
              models: Seq[(String, Array[Double])],
              k: Int = 12): DataFrame = {
    val feats = bucketFeatures(text, k)
    val scored = models.foldLeft(docs) { case (df, (l, w)) =>
      df.withColumn(s"p_$l", round(QualityClassifier.prob(feats, w), 6))
    }
    val best = greatest(models.map { case (l, _) => col(s"p_$l") }: _*)
    scored.withColumn("predicted",
      models.foldRight(lit("und"): Column) { case ((l, _), acc) =>
        when(col(s"p_$l") === best, lit(l)).otherwise(acc)
      })
  }
}
