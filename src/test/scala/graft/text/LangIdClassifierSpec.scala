package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The trained language-ID head (one-vs-rest logistic over hashed char
  * trigram frequencies). The oracle queries (tx_langid_trained) pin the
  * trainer + predictor arithmetic exactly against DuckDB, but on the
  * synthetic testdata the lang label is uncorrelated with the text — so
  * REAL discrimination is asserted here, on genuinely multilingual
  * diacritic-bearing sentences.
  */
class LangIdClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    ("the quick brown fox jumps over the lazy dog and the cat sleeps", "en"),
    ("she said that this is the best thing with the right words", "en"),
    ("der schnelle braune fuchs springt über den faulen hund und die katze", "de"),
    ("sie sagte daß dies das beste ding mit den richtigen wörtern ist", "de"),
    ("el rápido zorro marrón salta sobre el perro perezoso y el niño", "es"),
    ("ella dijo que esto es lo mejor con las palabras señaladas así", "es"),
    ("le renard brun rapide saute par dessus le chien paresseux déjà", "fr"),
    ("elle a dit que c'était la meilleure chose avec les bons mots", "fr"))
  private val langs = Seq("de", "en", "es", "fr")

  test("learns real multilingual discrimination: train exactly, hold-out above chance") {
    val trainDf = train.toDF("text", "lang")
    val models = LangIdClassifier.train(trainDf, col("text"), col("lang"), langs)
    assert(models.map(_._1) === langs)
    assert(models.forall(_._2.forall(w => !w.isNaN && !w.isInfinite)))
    // the model must reproduce its own training labels perfectly (8/8 —
    // chance is 1/4) ...
    val onTrain = LangIdClassifier.predict(trainDf, col("text"), models)
      .select("lang", "predicted").as[(String, String)].collect()
    assert(onTrain.count { case (l, p) => l == p } === train.size,
      onTrain.mkString(", "))
    // ... and generalize to held-out sentences (≥ 3/4; chance ~1)
    val heldOut = Seq(
      ("the dog and the fox with the right words", "en"),
      ("der hund und die katze springt über den fuchs", "de"),
      ("el niño y el gato salta sobre las palabras así", "es"),
      ("le chien et le chat saute déjà avec les bons mots", "fr"))
      .toDF("text", "lang")
    val onHeld = LangIdClassifier.predict(heldOut, col("text"), models)
      .select("lang", "predicted").as[(String, String)].collect()
    assert(onHeld.count { case (l, p) => l == p } >= 3, onHeld.mkString(", "))
  }

  test("bucketFeatures: 6dp frequencies that sum to ~1; trigram-less docs ride the bias") {
    val feats = LangIdClassifier.bucketFeatures(col("text"))
    val rows = Seq("hello world of text", "ab", "").toDF("text")
      .select(array(feats.drop(1): _*).as("xs"), feats.head.as("bias"))
      .as[(Seq[Double], Double)].collect()
    rows.foreach { case (xs, bias) =>
      assert(bias === 1.0)
      assert(xs.forall(x => x >= 0.0 && x <= 1.0))
      assert(xs.forall(x => (x * 1e6).round / 1e6 === x), "6dp rounded")
    }
    assert(math.abs(rows(0)._1.sum - 1.0) < 1e-4) // full doc: freqs sum to 1
    assert(rows(1)._1.forall(_ === 0.0)) // "ab" has no length-3 trigram
    assert(rows(2)._1.forall(_ === 0.0)) // empty text
  }

  test("predict is a pure projection over the corpus — no shuffle, no UDF") {
    val trainDf = train.toDF("text", "lang")
    val models = LangIdClassifier.train(trainDf, col("text"), col("lang"), langs)
    val plan = LangIdClassifier.predict(
      Seq(("x", "some text here")).toDF("id", "text"), col("text"), models)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
