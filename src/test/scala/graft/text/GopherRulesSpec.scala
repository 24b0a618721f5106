package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class GopherRulesSpec extends SparkSpec {

  import spark.implicits._

  // one doc per rule-failure mode, plus a clean keeper
  private val docs = Seq(
    // 24 distinct 4-letter words incl. "the"+"a"+... -> passes everything
    (1L, ("the quick " + (1 to 20).map(i => s"word$i").mkString(" ") +
      " a is that").trim),
    (2L, "too few words here"), // fails r_wc (4 tokens)
    (3L, (1 to 30).map(_ => "x").mkString(" ") + " the a is"), // mwl < 3
    (4L, (1 to 28).map(i => s"w$i" * 6).mkString(" ")), // no stopwords
    (5L, "the " * 25 + "a is that " + (1 to 5).map(i => s"q$i").mkString(" ")), // top-token dominance + dup
    (6L, "") // zero tokens
  ).toDF("doc_id", "text")

  private def flags =
    GopherRules.ruleFlags(docs, col("doc_id"), col("text"))

  test("topTokenCount: sorted run-length fold == naive multiplicity max") {
    // one round trip for all cases: each generated list is a row
    val gen = Gen.listOfN(40, Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e")))
    val prop = Prop.forAll(gen) { (cases: List[List[String]]) =>
      val got = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("i", "toks")
        .select(col("i"), GopherRules.topTokenCount(col("toks")).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      cases.zipWithIndex.forall { case (toks, i) =>
        val want =
          if (toks.isEmpty) 0L
          else toks.groupBy(identity).values.map(_.size).max.toLong
        got(i.toLong) == want
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("ruleFlags: each crafted doc trips exactly the intended rule") {
    val f = flags.collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, c: String) =
      f(id).getBoolean(f(id).fieldIndex(c))

    assert(b(1L, "keep"), f(1L).toString) // the clean doc survives
    assert(!b(2L, "r_wc") && !b(2L, "keep"))
    assert(!b(3L, "r_mwl") && !b(3L, "keep")) // 30 1-char tokens drag mean < 3
    assert(!b(4L, "r_stop") && !b(4L, "keep"))
    assert(!b(5L, "r_top") && !b(5L, "r_dup") && !b(5L, "keep"))
    // zero tokens: ratio rules vacuous (0 >= 0), wc kills it
    assert(f(6L).getLong(1) === 0L)
    assert(!b(6L, "r_wc") && b(6L, "r_mwl") && b(6L, "r_alpha") &&
      b(6L, "r_top") && b(6L, "r_dup") && !b(6L, "keep"))
  }

  test("non-Latin docs have token signal: r_alpha and the token rules see Unicode (r17)") {
    // pre-r17 these tokenized to ZERO tokens (ASCII split) and died at
    // r_wc with no signal; and r_alpha's old [a-z] test would have
    // failed every token even once they existed
    val uni = Seq(
      // Cyrillic: 55 real words, stopwords absent -> r_stop is the only
      // legitimately-failing rule (the list is English policy)
      (10L, (1 to 55).map(i => s"слово$i").mkString(" ")),
      // CJK: each char a token; char-unit tokens are length 1 -> r_mwl
      // (mean in [3,10]) correctly fails, but NOT for lack of tokens
      (11L, "深層学習の訓練データは重複排除によって品質が大きく向上する" * 2),
      // accented Latin with English stopwords: a full keeper
      (12L, "the café " + (1 to 22).map(i => s"wörd$i").mkString(" ") +
        " a is that"))
      .toDF("doc_id", "text")
    val f = GopherRules.ruleFlags(uni, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, c: String) = f(id).getBoolean(f(id).fieldIndex(c))
    // token counts are REAL (n_tok is field 1)
    assert(f(10L).getLong(1) === 55L)
    assert(f(11L).getLong(1) === 58L) // 29 char-unit tokens x 2
    // Cyrillic words are alphabetic under \p{L}
    assert(b(10L, "r_alpha") && b(10L, "r_wc") && b(10L, "r_mwl"))
    assert(!b(10L, "r_stop")) // English stopword policy, correctly absent
    // CJK: alphabetic and counted; mean word length 1 trips r_mwl only
    assert(b(11L, "r_alpha") && b(11L, "r_wc") && !b(11L, "r_mwl"))
    // accented Latin keeper passes everything
    assert(b(12L, "keep"), f(12L).toString)
  }

  test("ruleFunnel: n_fail / n_sole_fail replay the flags exactly") {
    val rows = flags.collect()
    val rules = Seq("r_wc", "r_mwl", "r_alpha", "r_stop", "r_top", "r_dup")
    val fails = rows.map { r =>
      rules.map(c => c -> !r.getBoolean(r.fieldIndex(c))).toMap
    }
    val fun = GopherRules.ruleFunnel(flags).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fun.keySet === rules.toSet)
    rules.foreach { c =>
      val nFail = fails.count(_(c))
      val nSole = fails.count(m => m(c) && m.values.count(identity) == 1)
      assert(fun(c) === ((nFail.toLong, nSole.toLong)), c)
    }
  }

  test("ruleFlags is a map-only pass: no exchange in the plan") {
    val p = flags.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("custom Bounds move the thresholds (defaults are what the oracle pins)") {
    val loose = GopherRules.Bounds(minTokens = 1, minStopwords = 0,
      maxTopFrac = (1L, 1L), maxDupFrac = (1L, 1L))
    val f = GopherRules.ruleFlags(docs, col("doc_id"), col("text"), loose)
      .collect().map(r => r.getLong(0) -> r).toMap
    def b(id: Long, c: String) = f(id).getBoolean(f(id).fieldIndex(c))
    assert(b(2L, "r_wc"))                    // 4 tokens pass the 1-floor
    assert(b(4L, "r_stop"))                  // stopword floor waived
    assert(b(5L, "r_top") && b(5L, "r_dup")) // dominance/dup caps lifted
    assert(!b(6L, "r_wc"))                   // empty doc still below 1
    // keepExpr honors the same bounds
    val viaExpr = docs.filter(GopherRules.keepExpr(col("text"), loose))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaFlags = GopherRules.ruleFlags(docs, col("doc_id"), col("text"), loose)
      .filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaExpr === viaFlags)
  }

  test("keepExpr == ruleFlags.keep on fixtures AND the real corpus") {
    val viaExpr = docs.filter(GopherRules.keepExpr(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaFlags = flags.filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaExpr === viaFlags)
    val d = graft.core.Tables.load(spark, sf0001, "documents")
    val e = d.filter(GopherRules.keepExpr(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val f = GopherRules.ruleFlags(d, col("doc_id"), col("text"))
      .filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(e === f)
    assert(e.nonEmpty)
  }

  test("rules discriminate on the real corpus (nothing constant-true/false)") {
    val d = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val f = GopherRules.ruleFlags(d, col("doc_id"), col("text"))
    val n = f.count()
    // wc, stop, top must each reject SOME but not ALL docs at sf0.001 —
    // a gate that never fires (or always fires) is not a gate
    Seq("r_wc", "r_stop", "r_top").foreach { c =>
      val k = f.filter(col(c)).count()
      assert(k > 0 && k < n, s"$c kept $k of $n")
    }
    val kept = f.filter(col("keep")).count()
    assert(kept > 0 && kept < n, s"keep kept $kept of $n")
  }
}
