package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data curation, built entirely from
  * codegen'd Catalyst expressions (no UDFs) so they stay inside whole-stage
  * codegen and are reproducible in an ANSI-SQL oracle.
  *
  * Covers: tokenization, token/char n-gram shingling, language-ID heuristic,
  * quality scoring, document fingerprinting.
  */
object TextFunctions {

  /** The regex inserting token breaks around NO-SPACE-script characters
    * (Han, Hiragana, Katakana, Thai): those scripts don't delimit words
    * with spaces, so the "word" normal form there is the CHARACTER — the
    * standard char-unit fallback (each such char becomes its own token).
    * Java spells Unicode scripts `\p{IsHan}`; DuckDB's RE2 spells the
    * same table `\p{Han}` ([[QText.toksSql]] is the oracle twin).
    */
  private[graft] val cjkSoloRe =
    "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsThai}])"

  /** Lowercased word tokens, empties removed — the engine's WORD-TOKEN
    * NORMAL FORM, Unicode-correct (r17; the previous `[^a-z0-9]+` split
    * zeroed out every non-Latin-script document: CJK/Arabic/Cyrillic
    * pages tokenized to an EMPTY array, so the quality gate dropped
    * them, Gopher rules failed them, and word-gram dedup /
    * decontamination / LM scoring saw nothing — while "café" lost its
    * accent). Three steps, each oracle-expressible in DuckDB RE2:
    *
    *  1. no-space scripts pre-split to single-character tokens
    *     ([[cjkSoloRe]]);
    *  2. split on anything outside `\p{L}\p{N}` (so letters and digits
    *     of EVERY script are token characters; `_` stays a separator —
    *     it is Pc, not L/N — preserving the word-gram `'_'` join);
    *  3. per-token lowercase (AFTER the split, so case anomalies like
    *     U+0130 İ whose lowercase adds a combining mark cannot change
    *     the split itself), empties dropped.
    *
    * On ASCII text this is byte-identical to the old form (A-Z fold into
    * the same runs), so every existing oracle hash over the ASCII test
    * tables is unchanged. Combining marks are separators (category Mn is
    * not \p{L}) — text should be NFC-normalized first (the dedupCorpus
    * entry default, [[graft.functions.NfcNormalizeExpr]]) so "café" is
    * one codepoint, not e + U+0301.
    */
  def tokens(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(
      graft.functions.TokenizeExpr(ColumnShim.expression(text)))
  }

  /** The HOF/regex executable SPECIFICATION of [[tokens]] — what the
    * kernel must reproduce bit-for-bit (ScalaCheck'd in
    * TextFunctionsSpec) and what the DuckDB oracle twin restates in RE2.
    * Not the production path: two Unicode-class regex passes plus two
    * interpreted (CodegenFallback) lambdas per document (r17
    * optimization round, guide §4.1 — the kernel walks the bytes once
    * inside whole-stage codegen).
    */
  private[graft] def tokensHof(text: Column): Column =
    filter(transform(split(regexp_replace(text, cjkSoloRe, " $1 "),
        "[^\\p{L}\\p{N}]+"), t => lower(t)), t => t =!= "")

  /** The pre-r17 ASCII-only token form, kept for callers that need the
    * legacy normal form (none in-engine — the curation chain runs the
    * Unicode form above).
    */
  def tokensAscii(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** `array_distinct(tokens(text))`, fused into the tokenize kernel
    * (first-occurrence order — ArrayDistinct's contract).
    */
  def distinctTokens(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.TokenizeExpr(
      ColumnShim.expression(text), distinct = true))
  }

  /** Character n-grams of the raw text (positions 1..len-n+1). */
  def charNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.CharNgramsExpr(
      ColumnShim.expression(text), n))
  }

  /** `array_distinct(charNgrams(text, n))` fused into the kernel — the
    * shape every Jaccard verify/sketch consumer uses (gram SETS).
    */
  def distinctCharNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.CharNgramsExpr(
      ColumnShim.expression(text), n, distinct = true))
  }

  /** The HOF executable SPECIFICATION of [[charNgrams]] (kernel parity
    * ScalaCheck'd in TextFunctionsSpec; the interpreted lambda's
    * per-position `substring` is O(len²) per document — not the
    * production path).
    */
  private[graft] def charNgramsHof(text: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => substring(text, i, lit(n)))

  /** Word n-grams over an already-materialized token array, joined with '_'.
    *
    * Takes the token ARRAY column, not the raw text: higher-order lambdas run
    * as CodegenFallback, so an inlined `tokens(text)` expression would be
    * re-evaluated (split + filter, interpreted) for every `element_at` at
    * every gram position — O(tokens²) regex work per document. Callers
    * project `tokens(text)` once and pass the bound attribute.
    */
  def wordNgramsFromTokens(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.WordNgramsExpr(
      ColumnShim.expression(toks), n))
  }

  /** The HOF executable SPECIFICATION of [[wordNgramsFromTokens]]
    * (kernel parity ScalaCheck'd in TextFunctionsSpec over arrays with
    * `size >= n` — the callers' standing precondition; the interpreted
    * per-gram lambda with n `element_at`s is not the production path).
    */
  private[graft] def wordNgramsFromTokensHof(toks: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws("_", (0 until n).map(j => element_at(toks, i + j)): _*))

  /** Word n-grams from raw text — convenience form for one-shot use; prefer
    * projecting [[tokens]] first and calling [[wordNgramsFromTokens]] in
    * anything performance-sensitive (see that method's scaladoc).
    */
  def wordNgrams(text: Column, n: Int): Column =
    wordNgramsFromTokens(tokens(text), n)

  /** NON-overlapping fixed-width token windows, each rejoined with a
    * space — the segmentation unit for corpus-frequency line dedup
    * ([[graft.dedup.Dedup.scrubFrequentSegments]]) on single-line
    * corpora, where a real `split(text, "\n")` would be degenerate. The
    * last window keeps the remainder (1..w tokens). Takes the token
    * ARRAY (see [[wordNgramsFromTokens]]'s CodegenFallback caveat);
    * caller must guarantee a non-empty array — on size 0 the window
    * count expression would walk `sequence` backwards.
    */
  def tokenWindows(toks: Column, w: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.TokenWindowsExpr(
      ColumnShim.expression(toks), w))
  }

  /** The HOF executable SPECIFICATION of [[tokenWindows]] (kernel parity
    * ScalaCheck'd in TextFunctionsSpec over non-empty arrays — the
    * standing caller precondition).
    */
  private[graft] def tokenWindowsHof(toks: Column, w: Int): Column =
    transform(
      sequence(lit(0), ceil(size(toks) / lit(w.toDouble)).cast("int") - 1),
      i => concat_ws(" ", slice(toks, i * w + 1, lit(w))))

  /** BPE-ish subword segmentation: letter runs, digit runs, and punctuation
    * runs, each optionally preceded by one space (the GPT-2 pre-tokenizer
    * shape, restricted to constructs whose regex semantics agree between
    * Java and RE2-style engines so the oracle reproduces it exactly).
    */
  val bpePattern: String = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

  /** Count of BPE-ish pre-tokens (proxy for LLM token counts). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Rolling-hash document signature: the k smallest hashes over the
    * document's distinct character n-grams (a winnowing-style fingerprint —
    * stable under small edits, unlike the exact-text md5). Returned as a
    * joined string so it is directly comparable/joinable.
    */
  def ngramSignature(text: Column, n: Int, k: Int): Column =
    array_join(slice(array_sort(transform(
      array_distinct(charNgrams(text, n)), g => md5(g))), 1, k), "|")

  /** Whitespace-normalized lowercase form used for fingerprinting. */
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Unicode NFC normalization (native codegen'd kernel,
    * [[graft.functions.NfcNormalizeExpr]]; quick-check fast path returns
    * already-normalized text as-is). Composed vs decomposed renderings of
    * identical text (U+00E9 vs e+U+0301) previously got different
    * fingerprints/MinHashes and evaded every dedup stage; the curation
    * chain applies this to the text column at entry (default-on).
    * Oracle twin: DuckDB `nfc_normalize(text)`.
    */
  def nfcNormalize(text: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.NfcNormalizeExpr(
      ColumnShim.expression(text)))
  }

  /** Email pattern shared by redaction + counting (RE2- and Java-regex
    * compatible: no lookaround, ASCII classes only, so Spark and the
    * DuckDB oracle match byte-for-byte).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-number-ish pattern: international prefix optional, ≥8 chars of
    * digits/dashes. Same cross-engine compatibility constraints.
    */
  val phoneRe = "\\+?\\d[\\d-]{6,}\\d"

  /** PII redaction — the pre-training scrub pass: emails first (so their
    * digit runs can't half-match as phones), then phone numbers. Plain
    * codegen'd regexp_replace chain; replacement order is part of the
    * contract (the oracle applies the same order).
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"),
      phoneRe, "<PHONE>")

  /** Count of PII spans that [[redactPii]] would replace: emails on the
    * raw text, phones on the email-redacted text — the same pass order as
    * the redaction, so a digit-bearing email local part is one span, not
    * two.
    */
  def piiCount(text: Column): Column =
    (regexp_count(text, lit(emailRe)) +
      regexp_count(regexp_replace(text, emailRe, "<EMAIL>"), lit(phoneRe)))
      .cast("int")

  /** Markup stripping — boilerplate removal for scraped HTML: drop tags,
    * collapse the whitespace they leave behind, trim. Not an HTML parser
    * (no entity decoding, no script-content awareness) — the cheap
    * first-pass scrub before quality scoring; a real DOM extraction is a
    * decode-stage concern (U1 territory), not a relational one.
    */
  def stripMarkup(html: Column): Column =
    trim(regexp_replace(regexp_replace(html, "<[^>]+>", " "), "\\s+", " "))

  /** FULL HTML → text extraction for raw-crawl ingest ([[stripMarkup]]
    * drops tags but keeps whatever was BETWEEN them — including
    * `<script>`/`<style>` bodies, so JavaScript and CSS leaked into the
    * corpus text on the `--warc` path). Pass order is part of the
    * contract (the oracle applies the same chain):
    *  1. script/style/head elements removed WITH their content
    *     (`(?is)` — case-insensitive, dot-matches-newline; non-greedy,
    *     so one unclosed tag can't eat the document);
    *  2. HTML comments removed;
    *  3. block-level tag boundaries become spaces ([[stripMarkup]]'s
    *     rule — inline-vs-block fidelity is a DOM concern, not a
    *     regex one);
    *  4. the XML named entities (&lt; &gt; &quot; &apos; &amp;), the
    *     numeric apostrophe &#39;, and &nbsp; decode (AFTER tag
    *     removal, so `&lt;script&gt;` in prose cannot conjure an
    *     element; &amp; LAST, so `&amp;lt;` decodes to the literal
    *     text `&lt;`, not `<`);
    *  5. whitespace collapses.
    * All constructs are RE2- and Java-compatible (no lookaround, no
    * backreferences — the element alternation is spelled out because
    * RE2 has no `\\1`), so DuckDB reproduces the decision
    * byte-for-byte (tx_html_extract). Not a DOM parser by design — the
    * cheap relational-side scrub; a browser-grade extraction is a
    * decode-stage concern (§7.5).
    */
  def extractHtmlText(html: Column): Column = {
    val noTags = regexp_replace(scrubHtmlElements(html), "<[^>]+>", " ")
    trim(regexp_replace(decodeHtmlEntities(noTags), "\\s+", " "))
  }

  /** Steps 1-2 of the extraction contract: script/style/head elements
    * removed WITH content, comments removed. Shared by
    * [[extractHtmlText]] and [[extractMainContent]].
    */
  private def scrubHtmlElements(html: Column): Column =
    regexp_replace(
      regexp_replace(html,
        "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|" +
          "<head[^>]*>.*?</head>", " "),
      "(?s)<!--.*?-->", " ")

  /** Step 4 of the extraction contract: the named-entity decode chain
    * (&amp; LAST so double-escaped text stays text). Shared by both
    * extractors.
    */
  private def decodeHtmlEntities(c: Column): Column = {
    val ent1 = regexp_replace(c, "&lt;", "<")
    val ent2 = regexp_replace(ent1, "&gt;", ">")
    val ent3 = regexp_replace(ent2, "&quot;", "\"")
    val ent4 = regexp_replace(ent3, "&#39;|&apos;", "'")
    val ent5 = regexp_replace(ent4, "&nbsp;", " ")
    regexp_replace(ent5, "&amp;", "&")
  }

  /** Block-level elements whose tags delimit DOM blocks for
    * [[extractMainContent]] — the jusText/Boilerpipe segmentation unit.
    */
  private val blockTagRe =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|" +
      "section|article|header|footer|nav|aside|blockquote|pre|form|" +
      "fieldset|figure|figcaption|main|br|hr)\\b[^>]*>"

  /** DOM-BLOCK boilerplate removal (r17 verdict #3) — the per-document
    * stage RefinedWeb-class pipelines run at ingest, which the
    * corpus-frequency line scrub (d24) cannot replace: nav menus,
    * footers, and cookie banners are boilerplate on THIS page even when
    * not frequent across the corpus. jusText-shaped, in pure
    * RE2/Java-compatible regexp steps so DuckDB replays the decision
    * exactly (tx_block_extract):
    *
    *  1. control sentinels scrubbed from the input (U+0001..U+0003 —
    *     adversarial text cannot inject block/link markers);
    *  2. script/style/head + comments removed ([[scrubHtmlElements]]);
    *  3. anchor elements marked: `<a ...>X</a>` → `U+0002 X U+0003`
    *     (the link-density signal; an anchor split across blocks by an
    *     illegal block tag inside it loses its marker pair — that
    *     block's link length under-counts, never crashes);
    *  4. every block-level tag ([[blockTagRe]]) becomes a block
    *     sentinel U+0001; remaining (inline) tags become spaces;
    *     entities decode;
    *  5. per block: `vis` = whitespace-collapsed text without link
    *     markers, `link_len` = summed collapsed length of the marked
    *     anchor spans. KEEP the block iff
    *     `length(vis) >= minBlockChars` AND
    *     `link_len * linkDen <= length(vis) * linkNum`
    *     (integer cross-multiplication — no float can flip a block);
    *  6. kept blocks join with a space and collapse.
    *
    * Defaults (25 chars, link fraction ≤ 1/3) are the jusText
    * short-block / link-density spirit sized for extracted fixtures;
    * navigation bars are link-dense short blocks and fail both tests,
    * body paragraphs pass. The `--warc` ingest applies this by default
    * (opt-out `--no-block-filter`, falling back to
    * [[extractHtmlText]]).
    */
  def extractMainContent(html: Column, minBlockChars: Int = 25,
                         linkNum: Int = 1, linkDen: Int = 3): Column = {
    require(minBlockChars >= 0 && linkNum >= 0 && linkDen >= 1,
      s"extractMainContent: bad thresholds ($minBlockChars, $linkNum/$linkDen)")
    val clean0 = regexp_replace(html, "[\\x01\\x02\\x03]", " ")
    val marked = regexp_replace(scrubHtmlElements(clean0),
      "(?is)<a\\b[^>]*>(.*?)</a>", "\u0002$1\u0003")
    val blocked = regexp_replace(marked, blockTagRe, "\u0001")
    val noTags = regexp_replace(blocked, "<[^>]+>", " ")
    val decoded = decodeHtmlEntities(noTags)
    val blocks = split(decoded, "\\x01")
    def visOf(b: Column): Column =
      trim(regexp_replace(regexp_replace(b, "[\\x02\\x03]", ""), "\\s+", " "))
    def linkLenOf(b: Column): Column =
      aggregate(regexp_extract_all(b, lit("(?s)\\x02(.*?)\\x03"), lit(1)),
        lit(0), (a, s) =>
          a + length(trim(regexp_replace(s, "\\s+", " "))))
    val kept = filter(blocks, b =>
      length(visOf(b)) >= minBlockChars &&
        linkLenOf(b) * linkDen <= length(visOf(b)) * linkNum)
    trim(regexp_replace(array_join(transform(kept, b => visOf(b)), " "),
      "\\s+", " "))
  }

  /** Document fingerprint: md5 of the normalized text (stable across engines). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Stopword-marker lists for the language-ID heuristic. Tiny on purpose:
    * the heuristic is a deterministic scoring rule, not a trained model.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  /** Score for one language: number of distinct marker words present. */
  def langScore(text: Column, lang: String): Column =
    size(array_intersect(distinctTokens(text),
      array(langMarkers(lang).map(lit): _*)))

  /** Predicted language: argmax score, ties broken by language code order. */
  def langId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val scores = langs.map(l => langScore(text, l))
    val best = greatest(scores: _*)
    langs.zip(scores).foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** English stopword ratio among tokens (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val stop = array(Seq("the", "a", "an", "and", "or", "of", "to", "in",
      "is", "it", "that", "for").map(lit): _*)
    val toks = tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(stop, t))).cast("double") / size(toks))
      .otherwise(0.0)
  }

  /** Punctuation ratio: non-letter/number, non-space chars / total chars
    * — the Unicode class (`\p{L}\p{N}`), matching the [[tokens]] normal
    * form (r17): under the old `[^a-zA-Z0-9 ]` every CJK/Cyrillic/accented
    * character counted as punctuation, so any non-Latin page blew the
    * qualityScore punct penalty even before its tokens were counted.
    */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[^\\p{L}\\p{N} ]", "")))
        .cast("double") / length(text))
      .otherwise(0.0)

  /** Mean token length. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(0.0)
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation and a natural stopword rate. Deterministic and
    * oracle-expressible; weights are engine policy, not learned.
    */
  def qualityScore(text: Column): Column =
    qualityFrom(text, punctRatio(text), stopwordRatio(text))

  private def qualityFrom(text: Column, punct: Column, stop: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punct * 5.0, lit(1.0))
    val stopScore = least(stop * 4.0, lit(1.0))
    lenScore * 0.4 + punctPenalty * 0.3 + stopScore * 0.3
  }

  // ---- native single-pass forms --------------------------------------
  // Same results as the HOF/regexp forms above (parity asserted in
  // TextFunctionsSpec), but computed by allocation-free byte-walk kernels
  // inside whole-stage codegen (graft.functions.TextStatsKernel). The
  // session must have graft's functions registered
  // (GraftExtensions.register or spark.sql.extensions).

  def punctRatioNative(text: Column): Column =
    call_function("graft_punct_ratio", text)

  def stopwordRatioNative(text: Column): Column =
    call_function("graft_stop_ratio", text)

  def avgTokenLenNative(text: Column): Column =
    call_function("graft_avg_token_len", text)

  def tokenCountNative(text: Column): Column =
    call_function("graft_token_count", text)

  /** [[qualityScore]] over the native kernels — identical doubles (same
    * integer counts, same division, same combination order).
    */
  def qualityScoreNative(text: Column): Column =
    qualityFrom(text, punctRatioNative(text), stopwordRatioNative(text))

  /** TF-IDF top term per document: tf = cnt/doc_len, idf = ln(N/df), winner
    * by (ROUNDED score desc, token asc) — ordering on the rounded score so
    * a 1e-17 float tie cannot rank differently across engines. The
    * (doc, token) count relation feeds three branches (tf, doc length,
    * document frequency), so it is materialized once — to COLUMNAR
    * scratch, not localCheckpoint: it has one thin row per (doc, token)
    * TYPE, i.e. corpus-vocabulary-instance scale, exactly the tier where
    * object-block pinning hit the measured 40M-row cliff (SURVEY §6.3
    * budgetdiag). Output: (doc_id, top_term, tfidf). Shared by the
    * tx_tfidf query and the scale probe — one implementation to keep
    * benched and probed code identical.
    */
  def tfidfTopTerm(docs: org.apache.spark.sql.DataFrame, id: Column,
                   text: Column, roundTo: Int = 6): org.apache.spark.sql.DataFrame = {
    val tf = graft.core.Scratch.materialize(
      docs.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt")),
      "tfidf_tf")
    val len = tf.groupBy("doc_id").agg(sum("cnt").as("len"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(len, "doc_id").join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round((col("cnt") / col("len")) *
        log(col("n_docs") / col("df")), roundTo))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("tfidf").desc, col("tok"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("tok").as("top_term"), col("tfidf"))
  }

  /** BIGRAM-LM DOCUMENT SCORING — the in-engine form of CCNet's
    * language-model quality filter (Wenzek et al. 2020 score documents
    * by LM perplexity and keep the head of the distribution; the
    * reference-scale pipelines all carry some LM-score gate). The model
    * is an add-α bigram LM trained on the scored corpus itself:
    * per-instance log-prob ln((c(w₁w₂)+α) / (c(w₁·)+α·V)) with c(w₁·)
    * the bigram-PREFIX count (self-consistent conditioning), V the
    * corpus vocabulary over scored docs; a document's score is the MEAN
    * instance log-prob — avg_logp = −ln(perplexity), higher = more
    * typical of the corpus, so a threshold on it is the perplexity
    * gate, and the LOW tail is the gibberish/outlier report.
    *
    * Exactness contract (cross-engine): each instance log-prob rounds
    * to 6dp, sums as fixed-point longs (order-insensitive), divides
    * once — the tx_classifier/d23 discipline.
    *
    * Scale shape: one token explode for the counts, equi-joins of the
    * corpus-sized instance relation against the (≪ corpus) count
    * tables, one doc-keyed aggregate. No windows, no products; the
    * vocabulary scalar broadcasts. Docs with < 2 tokens have no bigram
    * and drop out (document the gate before the score).
    *
    * The instance relation (one row per bigram OCCURRENCE — corpus-token
    * scale; the LM trains on the corpus it scores, so at 10M docs this
    * is ~10⁹ rows) feeds the type aggregate AND the scoring join: it is
    * materialized ONCE, to COLUMNAR scratch — localCheckpoint here
    * would pin the whole tokenized corpus as deserialized object blocks,
    * the engine's own measured 40M-row cliff (SURVEY §6.3 budgetdiag,
    * 88.6→17.4 s when moved to scratch). The vocabulary is counted off
    * the SAME materialization: every token of a ≥2-token doc appears as
    * some bigram's w1 or w2, so distinct(w1 ∪ w2) ≡ distinct tokens of
    * the gated docs — no second corpus scan, identical value. Scoring
    * joins the per-TYPE log-prob once (r18) rather than attaching each
    * count to every instance.
    *
    * Output: (doc_id, n_bigrams, avg_logp).
    */
  def bigramLmScores(docs: DataFrame, id: Column, text: Column,
                     alpha: Double = 0.5): DataFrame = {
    // tokens never contain '_' (the tokenizer strips non-[a-z0-9]), so
    // the joined bigram string splits back losslessly
    val inst = graft.core.Scratch.materialize(
      docs.select(id.as("doc_id"), tokens(text).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"),
          explode(wordNgramsFromTokens(col("toks"), 2)).as("bigram"))
        .withColumn("w1", split(col("bigram"), "_")(0)),
      "lm_inst")
    val c12 = inst.groupBy("bigram").agg(count(lit(1)).as("c12"))
    val c1 = inst.groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = inst.select(col("w1").as("tok"))
      .union(inst.select(split(col("bigram"), "_")(1).as("tok")))
      .agg(countDistinct(col("tok")).as("v"))
    // per-TYPE log-prob, instance joins the finished lp6 ONCE (r18) —
    // the trigramLmScoresKn discipline: lp6 is a function of the bigram
    // TYPE's counts alone, so the c1 attach runs at type scale and the
    // instance relation pays a single exchange for scoring instead of
    // two (self-trained count tables are corpus-derived — past
    // broadcast size at the 10M-doc tier, where each extra instance
    // join is a full shuffle). A second A/B kept c1/v as
    // instance-side aggregates: deriving them from a materialized type
    // relation added a scratch-write job that cost more at bench scale
    // than the saved reads, and at cluster scale both forms are one
    // map-side-combined pass.
    val typed = c12
      .withColumn("w1", split(col("bigram"), "_")(0))
      .join(c1, "w1").crossJoin(broadcast(v))
      .withColumn("lp6", round(
        log((col("c12") + lit(alpha)) / (col("c1") + lit(alpha) * col("v"))),
        6))
      .select("bigram", "lp6")
    inst.join(typed, "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(col("lp6") * 1e6).cast("long")).as("__s6"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s6") / (col("n_bigrams") * 1e6), 6).as("avg_logp"))
  }

  /** Interpolated KNESER-NEY bigram scoring — the smoothing family
    * KenLM (and hence CCNet's real perplexity gate) uses, vs
    * [[bigramLmScores]]' add-α:
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1·)
    *            + (D · N1+(w1·)/c(w1·)) · N1+(·w2)/N1+(··)
    *
    * — absolute discount D (0.75, engine policy) on the bigram count,
    * the freed mass backing off to the CONTINUATION probability: how
    * many distinct contexts w2 follows, not how often it occurs — the
    * fix for "Francisco is frequent but only ever follows San". All
    * counts are exact integers from two aggregates over the bigram-type
    * relation; the per-instance log-prob is written with IDENTICAL
    * float association in the DuckDB oracle, rounds to 6dp, and sums as
    * exact longs (the [[bigramLmScores]] fixed-point discipline), so
    * the doc mean is hash-exact cross-engine. Same scale shape as the
    * add-α form: one token explode + equi-joins against ≪-corpus count
    * tables + one doc aggregate; the N1+(··) total rides the
    * allowlisted one-row broadcast cross. P > 0 always (c12 ≥ 1 ⇒ the
    * continuation term alone is positive), so ln never sees zero.
    */
  def bigramLmScoresKn(docs: DataFrame, id: Column, text: Column,
                       discount: Double = 0.75): DataFrame = {
    // the instance relation (one row per bigram occurrence — corpus-token
    // scale, since this form trains on the corpus it scores) feeds the
    // count aggregates AND the scoring join: one COLUMNAR scratch
    // materialization, never object blocks (the [[bigramLmScores]]
    // rationale — §6.3's measured 40M-row localCheckpoint cliff)
    // (doc_id, bigram) ONLY — the w1/w2 splits live on the TYPE relation
    // since r18 (c1 derives there and scoring joins the finished lp6),
    // so carrying them per-instance was pure scratch width
    val inst = graft.core.Scratch.materialize(
      docs.select(id.as("doc_id"), tokens(text).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"),
          explode(wordNgramsFromTokens(col("toks"), 2)).as("bigram")),
      "lmkn_inst")
    // the bigram-TYPE relation feeds five readers (c1, both N1+
    // aggregates, the type total, and the typed-lp6 join) — materialize
    // it once too: types ≪ occurrences but still corpus-vocabulary²
    // scale, well past the object-block-safe tier at 10M docs
    val c12 = graft.core.Scratch.materialize(
      inst.groupBy("bigram").agg(count(lit(1)).as("c12"))
        .withColumn("w1", split(col("bigram"), "_")(0))
        .withColumn("w2", split(col("bigram"), "_")(1)),
      "lmkn_c12")
    // c(w1·) = Σ_w2 c(w1w2) off the TYPE relation (r18) — an exact
    // integer identity; the previous instance-scale count aggregate
    // re-read the corpus-token scratch for a number the vocabulary²
    // relation already holds
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val fwd = c12.groupBy("w1").agg(count(lit(1)).as("n1p_fwd"))
    val rev = c12.groupBy("w2").agg(count(lit(1)).as("n1p_rev"))
    val tt = c12.agg(count(lit(1)).as("tt"))
    val d = lit(discount)
    // per-TYPE log-prob, instance joins the finished lp6 ONCE — the
    // trigramLmScoresKn discipline applied one order down (r18): every
    // term of the formula is a function of the bigram TYPE's counts, so
    // the four count joins run at type scale and the instance relation
    // pays a single exchange for scoring instead of four (self-trained
    // model tables are corpus-derived — past broadcast size at the
    // 10M-doc tier, where each extra instance join was a full shuffle;
    // §6.3 lm r13 A/B measured 294.2 → 207.9 s for the trigram form)
    val typed = c12
      .join(c1, "w1").join(fwd, "w1").join(rev, "w2")
      .crossJoin(broadcast(tt))
      .withColumn("lp6", round(log(
        greatest(col("c12").cast("double") - d, lit(0.0)) / col("c1") +
          (d * col("n1p_fwd") / col("c1")) * (col("n1p_rev") / col("tt"))),
        6))
      .select("bigram", "lp6")
    inst.join(typed, "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(col("lp6") * 1e6).cast("long")).as("__s6"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s6") / (col("n_bigrams") * 1e6), 6).as("avg_logp"))
  }

  /** TRIGRAM interpolated Kneser-Ney scoring — one more order of context
    * than [[bigramLmScoresKn]] (KenLM's production gates run 5-gram; the
    * trigram form shows the recursion, and each further order is the
    * same pattern again):
    *
    *   P(w3|w1w2) = max(c(w1w2w3) − D, 0)/c(w1w2·)
    *              + (D · N1+(w1w2·)/c(w1w2·)) · P₂(w3|w2)
    *   P₂(w3|w2)  = max(N1+(·w2w3) − D, 0)/N1+(·w2·)
    *              + (D · N1u(w2)/N1+(·w2·)) · N1+(··w3)/N1+(···)
    *
    * — the middle and bottom layers run entirely on CONTINUATION (type)
    * counts derived from the trigram-type relation (Chen & Goodman's
    * interpolated KN): N1+(·w2w3) = distinct left-contexts of (w2,w3),
    * N1+(·w2·) their per-w2 total, N1u(w2) = distinct (w2,·) continuation
    * pairs, N1+(··w3)/N1+(···) the pair-type continuation unigram.
    * Self-trained (the [[bigramLmScoresKn]] deployment shape), so every
    * scored instance has c123 ≥ 1 ⇒ N1+(·w2w3) ≥ 1 ⇒ P₂ > 0 ⇒ P > 0 —
    * ln never sees zero, no OOV branch needed. Docs need ≥ 3 tokens.
    *
    * Exactness: the oracle restates the formula with IDENTICAL float
    * association; instance log-probs round to 6dp and sum as exact longs
    * (the family's fixed-point discipline). Scale shape: the instance
    * and type relations are corpus-token / vocabulary³-type scale and
    * materialize to COLUMNAR scratch (the r12 sweep rule); the log-prob
    * depends only on the trigram TYPE, so it is computed on the TYPE
    * relation (type-scale joins only) and the instance relation joins
    * the finished per-type lp6 ONCE — one instance-scale exchange for
    * scoring instead of the five the naive join chain pays (keys
    * (w1,w2,w3)/(w1,w2)/(w2,w3)/(w2)/(w3); A/B at the 10M-doc tier:
    * five-shuffle 294.2 s, this form 207.9 s, §6.3 lm r13; the
    * self-trained model tables are corpus-derived — at 10M docs the
    * type relation is past broadcast size, so unlike the Against form
    * the join chain cannot collapse to broadcasts); c(w1w2·) = Σ_w3
    * c123 off the type relation, so the instance relation feeds
    * exactly two exchanges total (type aggregate + scoring join) plus
    * the map-side-combined doc aggregate. The one-row type total rides
    * the allowlisted broadcast cross.
    * Output: (doc_id, n_trigrams, avg_logp).
    */
  def trigramLmScoresKn(docs: DataFrame, id: Column, text: Column,
                        discount: Double = 0.75): DataFrame = {
    val inst = graft.core.Scratch.materialize(
      docs.select(id.as("doc_id"), tokens(text).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          explode(wordNgramsFromTokens(col("toks"), 3)).as("trigram"))
        .select(col("doc_id"),
          split(col("trigram"), "_")(0).as("w1"),
          split(col("trigram"), "_")(1).as("w2"),
          split(col("trigram"), "_")(2).as("w3")),
      "lmkn3_inst")
    // the six count tables — ONE definition shared with fitTrigramKn
    // (knTablesFromInstances), so the self-trained and Against forms
    // cannot drift
    val m = knTablesFromInstances(inst, "lmkn3_s")
    val d = lit(discount)
    // per-TYPE log-prob: every term is a function of the type's counts,
    // so the whole formula evaluates on the type relation
    val typed = m.t3
      .join(m.pfx, Seq("w1", "w2"))
      .join(m.mid, Seq("w2", "w3")).join(m.w2agg, Seq("w2"))
      .join(m.rev, Seq("w3"))
      .crossJoin(broadcast(m.tt))
      .withColumn("__p2",
        greatest(col("n1a").cast("double") - d, lit(0.0)) / col("n1mid") +
          (d * col("nu2") / col("n1mid")) * (col("rev3") / col("tt")))
      .withColumn("lp6", round(log(
        greatest(col("c123").cast("double") - d, lit(0.0)) / col("c12") +
          (d * col("npfx") / col("c12")) * col("__p2")), 6))
      .select("w1", "w2", "w3", "lp6")
    inst.join(typed, Seq("w1", "w2", "w3"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(round(col("lp6") * 1e6).cast("long")).as("__s6"))
      .select(col("doc_id"), col("n_trigrams"),
        round(col("__s6") / (col("n_trigrams") * 1e6), 6).as("avg_logp"))
  }

  /** [[bigramLmScoresKn]] with a SEPARATE training corpus — the deployed
    * CCNet shape: the LM is fit on the TARGET set (wiki-quality text) and
    * scores the raw corpus, so out-of-vocabulary back-off must be
    * defined. Deterministic OOV policy, every branch ln-safe:
    *
    *  - bigram unseen, prefix seen: c12 → 0, the discounted term
    *    vanishes, the continuation term carries;
    *  - prefix w1 unseen in training: pure continuation P = cont(w2);
    *  - w2 never a continuation in training: cont floors at 0.5/N1+(··)
    *    (half a type — below every seen continuation, still positive).
    *
    * Scale shape unchanged (train-side count tables ≪ corpus, LEFT
    * equi-joins, one-row type-total broadcast cross); same fixed-point
    * 6dp mean; the oracle restates every branch with identical float
    * association.
    */
  def bigramLmScoresKnAgainst(docs: DataFrame, id: Column, text: Column,
                              train: DataFrame, trainText: Column,
                              discount: Double = 0.75): DataFrame = {
    // the train-side INSTANCE relation has exactly one consumer — the
    // bigram-type aggregate (r18; the fitKn r17 rationale): its map-side
    // partial combine collapses instances in-flight, so the previous
    // instance-scale scratch write (Wikipedia-scale at the CCNet target)
    // was a full extra disk round-trip. c1 (the prefix instance count)
    // derives from the TYPE relation instead — c(w1·) = Σ_w2 c(w1w2), an
    // exact integer identity — so nothing else needed the instances.
    // The type relation stays on COLUMNAR scratch: five consumers (c1,
    // fwd, rev, tt, the scoring join), vocabulary²-scale at a real
    // target (the §6.3 cliff tier for object blocks).
    val ti = train.select(tokens(trainText).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(wordNgramsFromTokens(col("toks"), 2)).as("bigram"))
    val c12 = graft.core.Scratch.materialize(
      ti.groupBy("bigram").agg(count(lit(1)).as("c12"))
        .withColumn("w1", split(col("bigram"), "_")(0))
        .withColumn("w2", split(col("bigram"), "_")(1)),
      "lmkn_tc12")
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val fwd = c12.groupBy("w1").agg(count(lit(1)).as("n1p_fwd"))
    val rev = c12.groupBy("w2").agg(count(lit(1)).as("n1p_rev"))
    val tt = c12.agg(count(lit(1)).as("tt"))
    val d = lit(discount)
    val inst = docs.select(id.as("doc_id"), tokens(text).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(wordNgramsFromTokens(col("toks"), 2)).as("bigram"))
      .withColumn("w1", split(col("bigram"), "_")(0))
      .withColumn("w2", split(col("bigram"), "_")(1))
    inst.join(c12.select("bigram", "c12"), Seq("bigram"), "left")
      .join(c1, Seq("w1"), "left").join(fwd, Seq("w1"), "left")
      .join(rev, Seq("w2"), "left")
      .crossJoin(broadcast(tt))
      .withColumn("__cont",
        coalesce(col("n1p_rev").cast("double"), lit(0.5)) / col("tt"))
      .withColumn("__p", when(col("c1").isNotNull,
          greatest(coalesce(col("c12"), lit(0L)).cast("double") - d, lit(0.0)) /
            col("c1") +
            (d * col("n1p_fwd") / col("c1")) * col("__cont"))
        .otherwise(col("__cont")))
      .withColumn("lp6", round(log(col("__p")), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(col("lp6") * 1e6).cast("long")).as("__s6"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("__s6") / (col("n_bigrams") * 1e6), 6).as("avg_logp"))
  }

  /** [[trigramLmScoresKn]] with a SEPARATE training corpus — the
    * deployed CCNet shape at (closer to) KenLM order: the KN model is
    * fit on the TARGET set and scores the raw corpus, so out-of-model
    * back-off must be defined at EVERY layer of the Chen & Goodman
    * recursion. Deterministic policy, each layer falling through to the
    * next exactly like [[bigramLmScoresKnAgainst]]'s:
    *
    *  - trigram unseen, prefix (w1,w2) seen: c123 → 0, the discounted
    *    term vanishes, the interpolation weight carries into P₂;
    *  - prefix (w1,w2) never a trigram prefix in training: P = P₂(w3|w2);
    *  - continuation pair (w2,w3) unseen but w2 seen as a middle
    *    context: N1+(·w2w3) → 0, P₂'s continuation term carries;
    *  - w2 never a middle context: P₂ = cont(w3);
    *  - w3 never a continuation: cont floors at 0.5/N1+(···) (half a
    *    type — below every seen continuation, still positive).
    *
    * Every branch ends in a strictly positive term, so ln never sees
    * zero (driver-replayed per branch in TextFunctionsSpec). Scale
    * shape: train-side instance/type relations on COLUMNAR scratch
    * (CCNet's target is Wikipedia-scale — the measured §6.3 cliff, same
    * as the bigram form); prefix counts derive from the trigram-TYPE
    * relation (c(w1w2·) = Σ_w3 c123), so no second instance aggregate;
    * the scored side stays lazy (one consumer); LEFT equi-joins against
    * ≪-corpus count tables; the one-row pair-type total rides the
    * allowlisted broadcast cross. Same fixed-point 6dp mean; the oracle
    * restates every branch with identical float association.
    * Output: (doc_id, n_trigrams, avg_logp).
    */
  def trigramLmScoresKnAgainst(docs: DataFrame, id: Column, text: Column,
                               train: DataFrame, trainText: Column,
                               discount: Double = 0.75): DataFrame =
    scoreTrigramsKn(docs, id, text, fitTrigramKn(train, trainText), discount)

  /** Frozen trigram-KN count tables fit on a training corpus — the
    * fit-once artifact behind [[trigramLmScoresKnAgainst]], exposed so
    * "fit once, score many" deployments (daily shards, the streaming
    * twin) never re-derive the trainer per scoring pass. Every relation
    * is backed by columnar scratch or derives from one with a single
    * aggregate, so a model instance is reusable across any number of
    * [[scoreTrigramsKn]] calls (and micro-batches) at read-only cost.
    * All counts are ≪-corpus (type-relation scale); a deployment that
    * wants the model DURABLE across drivers writes the six relations as
    * parquet and reopens them — they are plain DataFrames.
    */
  final case class TrigramKnModel(t3: DataFrame, pfx: DataFrame,
                                  mid: DataFrame, w2agg: DataFrame,
                                  rev: DataFrame, tt: DataFrame)

  /** Fit the [[TrigramKnModel]] count tables on `train` (the CCNet
    * target slice). Scale shape: the train-side instance relation is
    * Wikipedia-scale in deployment — COLUMNAR scratch (the measured
    * §6.3 cliff); every count table derives from the trigram-TYPE
    * relation, incl. the instance-prefix count (c(w1w2·) = Σ_w3 c123 —
    * no second instance aggregate).
    */
  def fitTrigramKn(train: DataFrame, trainText: Column): TrigramKnModel = {
    // instance relation: ONE consumer (knTablesFromInstances' t3
    // aggregate) — no scratch write (r17 optimization round; the
    // aggregate's map-side partial combine collapses the instances
    // in-flight, so materializing them first was a full extra disk
    // round-trip of the largest relation in the trainer). Contrast
    // trigramLmScoresKn (self-trained), where the instance relation ALSO
    // feeds the scoring join and stays materialized.
    val ti = train.select(tokens(trainText).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(explode(wordNgramsFromTokens(col("toks"), 3)).as("trigram"))
      .select(split(col("trigram"), "_")(0).as("w1"),
        split(col("trigram"), "_")(1).as("w2"),
        split(col("trigram"), "_")(2).as("w3"))
    val model = knTablesFromInstances(ti, "lmkn3_t")
    // an empty/all-short target yields tt = 0, and 0.5/0 = Infinity
    // would give EVERY scored doc a garbage positive avg_logp that
    // passes any cutoff — a silently-vacuous gate. Fail loudly (cheap:
    // t3 is scratch-backed, isEmpty is a limit-1 scan).
    require(!model.t3.isEmpty,
      "fitTrigramKn: the training corpus has no trigrams (empty target, " +
        "or every doc < 3 tokens) — the KN model would be vacuous and " +
        "the perplexity gate a silent no-op")
    model
  }

  /** The six KN count tables off an already-exploded (w1,w2,w3)
    * instance relation — ONE definition shared by [[fitTrigramKn]] and
    * the self-trained [[trigramLmScoresKn]], so the two forms cannot
    * drift (c(w1w2·) = Σ_w3 c123 off the type relation in both).
    */
  private def knTablesFromInstances(inst: DataFrame,
                                    tag: String): TrigramKnModel = {
    val t3 = graft.core.Scratch.materialize(
      inst.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123")),
      s"${tag}3")
    val pfx = t3.groupBy("w1", "w2")
      .agg(sum("c123").as("c12"), count(lit(1)).as("npfx"))
    val mid = graft.core.Scratch.materialize(
      t3.groupBy("w2", "w3").agg(count(lit(1)).as("n1a")),
      s"${tag}mid")
    val w2agg = mid.groupBy("w2")
      .agg(sum("n1a").as("n1mid"), count(lit(1)).as("nu2"))
    val rev = mid.groupBy("w3").agg(count(lit(1)).as("rev3"))
    val tt = mid.agg(count(lit(1)).as("tt"))
    TrigramKnModel(t3, pfx, mid, w2agg, rev, tt)
  }

  /** The LM-perplexity GATE both curation surfaces share
    * ([[graft.pipelines.Pipelines.dedupCorpus]]'s lm_gate stage and the
    * ingest-daily CLI): score `docs` against the frozen model and keep
    * rows whose avg_logp clears the cutoff. Docs too short to score
    * (< 3 tokens — no trigram, no score) PASS: the gate drops on
    * evidence of high perplexity; shortness is the quality gate's
    * jurisdiction. One definition so batch and day-2 gating can never
    * diverge.
    */
  def lmGate(docs: DataFrame, id: Column, text: Column,
             model: TrigramKnModel, minAvgLogp: Double): DataFrame = {
    val scores = scoreTrigramsKn(docs, id, text, model)
      .select(col("doc_id").as("__lm_id"), col("avg_logp").as("__lm_lp"))
    // join on the RAW id expression — scoreTrigramsKn keys its output by
    // `id` as-is, so no cast is needed, and none is safe: a cast("long")
    // on a non-numeric id yields null, every row misses the join, and the
    // isNull pass-branch would wave the whole corpus through — a silently
    // fail-open gate (r13 ADVICE). The isNull branch is ONLY for docs too
    // short to score (< 3 tokens — no trigram, no evidence).
    docs.join(scores, id === col("__lm_id"), "left")
      .filter(col("__lm_lp").isNull || col("__lm_lp") >= minAvgLogp)
      .drop("__lm_id", "__lm_lp")
  }

  /** Score `docs` against a frozen [[TrigramKnModel]] — the per-shard /
    * per-micro-batch half of the Against form. Purely per-document:
    * no state across calls, so the batch operator is the streaming
    * operator ([[graft.streaming.Streaming.scoreLmKn3StreamSink]]).
    *
    * Scale shape — deliberately DIFFERENT from the self-trained form's
    * type-level scoring: here the model tables derive from the TARGET
    * corpus, which is the small side next to the scored crawl, so the
    * direct left-join chain lets Spark broadcast them and the whole
    * scoring pass stays instance-shuffle-free. The A/B at the 10M-doc
    * tier measured this chain at 100.3 s vs 404.4 s for a
    * distinct-types-then-join restructure (the extra instance-scale
    * distinct + sort-merge join cost far more than the broadcast
    * chain; §6.3 lm r13) — the opposite verdict from the self-trained
    * form, whose corpus-derived count tables cannot broadcast.
    */
  def scoreTrigramsKn(docs: DataFrame, id: Column, text: Column,
                      model: TrigramKnModel,
                      discount: Double = 0.75): DataFrame = {
    val d = lit(discount)
    val inst = docs.select(id.as("doc_id"), tokens(text).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(wordNgramsFromTokens(col("toks"), 3)).as("trigram"))
      .select(col("doc_id"),
        split(col("trigram"), "_")(0).as("w1"),
        split(col("trigram"), "_")(1).as("w2"),
        split(col("trigram"), "_")(2).as("w3"))
    inst.join(model.t3, Seq("w1", "w2", "w3"), "left")
      .join(model.pfx, Seq("w1", "w2"), "left")
      .join(model.mid, Seq("w2", "w3"), "left")
      .join(model.w2agg, Seq("w2"), "left")
      .join(model.rev, Seq("w3"), "left")
      .crossJoin(broadcast(model.tt))
      .withColumn("__cont",
        coalesce(col("rev3").cast("double"), lit(0.5)) / col("tt"))
      .withColumn("__p2", when(col("n1mid").isNotNull,
          greatest(coalesce(col("n1a"), lit(0L)).cast("double") - d, lit(0.0)) /
            col("n1mid") +
            (d * col("nu2") / col("n1mid")) * col("__cont"))
        .otherwise(col("__cont")))
      .withColumn("__p", when(col("c12").isNotNull,
          greatest(coalesce(col("c123"), lit(0L)).cast("double") - d, lit(0.0)) /
            col("c12") +
            (d * col("npfx") / col("c12")) * col("__p2"))
        .otherwise(col("__p2")))
      .withColumn("lp6", round(log(col("__p")), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(round(col("lp6") * 1e6).cast("long")).as("__s6"))
      .select(col("doc_id"), col("n_trigrams"),
        round(col("__s6") / (col("n_trigrams") * 1e6), 6).as("avg_logp"))
  }

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    * §4.3) over a scored corpus ([[bigramLmScoresKnAgainst]] output):
    * rank by model-likeness (avg_logp DESC — low perplexity first,
    * doc_id tie-break) and cut into terciles by EXACT integer
    * arithmetic (3·pos vs n, 2n), so the labels are engine-portable.
    * The rank runs the two-phase distributed machinery
    * ([[graft.ops.Sampling.rankByDistributed]]) — no corpus-wide
    * single-task window, the x19/x16 discipline — and n rides a one-row
    * broadcast cross. Output: scored columns + (pos, bucket).
    */
  def ccnetBuckets(scored0: DataFrame): DataFrame = {
    // two consumers (the rank and the one-row count) would otherwise each
    // re-run the whole scoring chain behind `scored0` — one columnar
    // materialization of the thin scored relation
    val scored = graft.core.Scratch.materialize(scored0, "ccnet_scored")
    val ranked = graft.ops.Sampling.rankByDistributed(
      scored, negate(col("avg_logp")), col("doc_id"))
    ranked.crossJoin(broadcast(scored.agg(count(lit(1)).as("__n"))))
      .withColumn("bucket",
        when(col("pos") * 3 <= col("__n"), "head")
          .when(col("pos") * 3 <= col("__n") * 2, "middle")
          .otherwise("tail"))
      .drop("__n")
  }

  /** The FROZEN-CUTOFF export closing the loop between
    * [[ccnetBuckets]]' corpus-global terciles and the per-shard gates
    * ([[graft.pipelines.Pipelines.dedupCorpus]] `lmMinAvgLogp`, the
    * ingest-daily `--lm-min-logp` flag, [[graft.streaming.Streaming
    * .scoreLmKn3StreamSink]] thresholding): the avg_logp value at each
    * tercile boundary of a scored REFERENCE corpus. `head_cut` is the
    * last head doc's score (gate `avg_logp >= head_cut` keeps CCNet's
    * head, modulo exact-tie docs which the rank splits by doc_id);
    * `middle_cut` the last middle doc's. Boundary positions are exact
    * integer arithmetic (floor(n/3), floor(2n/3) — the bucket rule's
    * own cut points), so the exported rows are engine-portable and the
    * whole export sits under the oracle hash. Corpora with < 3 docs
    * have no boundary and return empty. Output: (boundary, pos,
    * avg_logp), ≤ 2 rows.
    */
  def ccnetCutoffs(scored0: DataFrame): DataFrame = {
    val b = graft.core.Scratch.materialize(ccnetBuckets(scored0),
      "ccnet_cuts")
    b.crossJoin(broadcast(b.agg(count(lit(1)).as("__n"))))
      .filter(col("__n") >= 3 &&
        (col("pos") === floor(col("__n") / 3) ||
          col("pos") === floor(col("__n") * 2 / 3)))
      .withColumn("boundary",
        when(col("pos") * 3 <= col("__n"), lit("head_cut"))
          .otherwise(lit("middle_cut")))
      .select(col("boundary"), col("pos"), col("avg_logp"))
  }

  // ---- order-N Kneser-Ney (KenLM parity) ------------------------------
  // CCNet's deployed scorer is a 5-gram KenLM; the trigram machinery above
  // tops out at order 3 (r13 verdict gap #1). This is the SAME recursion
  // generalized over the order: one count-table pair per back-off layer on
  // the identical type-relation discipline, fit-once/score-many, with the
  // same fixed-point 6dp contract so the whole thing sits under a DuckDB
  // oracle. scoreKn at order 3 reproduces scoreTrigramsKn BIT-EXACTLY
  // (asserted in TextFunctionsSpec) — the trigram forms remain as the
  // settled oracle surface; new deployments pick the order here.

  /** Frozen order-N KN count tables ([[fitKn]]); the generalization of
    * [[TrigramKnModel]]. `top` is the n-gram type relation (w1..wn, cn);
    * `pfx` its prefix aggregate (dn = Σcn, nun = distinct continuations);
    * `mids(i)`/`aggs(i)` are the continuation-count table and its
    * context aggregate for back-off layer k = n-1-i (k runs n-1 down to
    * 2); `rev`/`tt` the unigram continuation counts. Every relation is
    * scratch-backed or one aggregate away from one — reusable across any
    * number of [[scoreKn]] calls at read-only cost, and all of them are
    * TYPE-relation sized (≪ corpus), so the Against-form scoring chain
    * broadcasts every join (the §6.3 r13 A/B verdict, unchanged by
    * order: more layers = more broadcast joins, never a shuffle).
    */
  final case class KnModel(order: Int, top: DataFrame, pfx: DataFrame,
                           mids: Seq[DataFrame], aggs: Seq[DataFrame],
                           rev: DataFrame, tt: DataFrame)

  /** Fit an order-`order` KN model on `train` — [[fitTrigramKn]]'s shape
    * at any order 2..8 (8 is a sanity bound, not a design limit; KenLM
    * deployments use 5). The train-side instance relation goes to
    * columnar scratch (the §6.3 cliff); every count table derives from
    * the n-gram TYPE relation — the instance is aggregated exactly once.
    */
  def fitKn(train: DataFrame, trainText: Column, order: Int): KnModel = {
    require(order >= 2 && order <= 8,
      s"fitKn: order must be in [2, 8], got $order")
    // the instance relation has exactly ONE consumer — the n-gram-type
    // aggregate below — so it is NOT materialized (r17 optimization
    // round; the scratch write was pure overhead: at a Wikipedia-scale
    // target it wrote the full instance n-gram relation to disk only to
    // re-read it once, where the aggregate's map-side partial combine
    // collapses it in-flight). Only the TYPE relation (multi-consumer:
    // the isEmpty guard, pfx, the mids chain, the scoring join) goes to
    // columnar scratch.
    val ti = train.select(tokens(trainText).as("toks"))
      .filter(size(col("toks")) >= order)
      .select(explode(wordNgramsFromTokens(col("toks"), order)).as("g"))
      .select((1 to order).map(i =>
        split(col("g"), "_")(i - 1).as(s"w$i")): _*)
    val n = order
    val top = graft.core.Scratch.materialize(
      ti.groupBy((1 to n).map(i => col(s"w$i")): _*)
        .agg(count(lit(1)).as("cn")),
      s"lmkn${order}_top")
    // same vacuous-gate guard as fitTrigramKn: tt = 0 would float every
    // scored doc to +inf and silently disable any gate built on this
    require(!top.isEmpty,
      s"fitKn: the training corpus has no $order-grams (empty target, " +
        s"or every doc < $order tokens) — the KN model would be vacuous " +
        "and a perplexity gate a silent no-op")
    val pfx = top.groupBy((1 until n).map(i => col(s"w$i")): _*)
      .agg(sum("cn").as("dn"), count(lit(1)).as("nun"))
    var cur = top
    val mids = Seq.newBuilder[DataFrame]
    val aggs = Seq.newBuilder[DataFrame]
    for (k <- (n - 1) to 2 by -1) {
      // continuation counts of the last k words: distinct extensions of
      // the previous level, grouped one word shorter on the left
      val keys = (n - k + 1 to n).map(i => s"w$i")
      val mid = graft.core.Scratch.materialize(
        cur.groupBy(keys.map(col): _*).agg(count(lit(1)).as(s"n$k")),
        s"lmkn${order}_m$k")
      val agg = mid.groupBy(keys.init.map(col): _*)
        .agg(sum(s"n$k").as(s"d$k"), count(lit(1)).as(s"nu$k"))
      mids += mid
      aggs += agg
      cur = mid
    }
    val rev = cur.groupBy(col(s"w$n")).agg(count(lit(1)).as("revn"))
    val tt = cur.agg(count(lit(1)).as("tt"))
    KnModel(order, top, pfx, mids.result(), aggs.result(), rev, tt)
  }

  /** Score `docs` against a frozen [[KnModel]] — [[scoreTrigramsKn]]'s
    * chain at any order: instance n-grams LEFT-join every count table
    * (all type-relation sized → broadcast; §6.3), then the back-off
    * recursion evaluates bottom-up as one codegen'd CASE nest, with the
    * identical float association and fixed-point 6dp mean as the trigram
    * form. Docs with < order tokens produce no row (no n-gram, no
    * evidence — the [[lmGate]] pass-through discipline). Output:
    * (doc_id, n_ngrams, avg_logp).
    */
  def scoreKn(docs: DataFrame, id: Column, text: Column, model: KnModel,
              discount: Double = 0.75): DataFrame = {
    val n = model.order
    val d = lit(discount)
    val inst = docs.select(id.as("doc_id"), tokens(text).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(wordNgramsFromTokens(col("toks"), n)).as("g"))
      .select(col("doc_id") +:
        (1 to n).map(i => split(col("g"), "_")(i - 1).as(s"w$i")): _*)
    var joined = inst
      .join(model.top, (1 to n).map(i => s"w$i"), "left")
      .join(model.pfx, (1 until n).map(i => s"w$i"), "left")
    for ((mid, idx) <- model.mids.zipWithIndex) {
      val k = n - 1 - idx
      joined = joined.join(mid, (n - k + 1 to n).map(i => s"w$i"), "left")
        .join(model.aggs(idx), (n - k + 1 until n).map(i => s"w$i"), "left")
    }
    joined = joined.crossJoin(broadcast(model.tt))
    var p: Column =
      coalesce(col("revn").cast("double"), lit(0.5)) / col("tt")
    for (k <- 2 to (n - 1)) {
      p = when(col(s"d$k").isNotNull,
        greatest(coalesce(col(s"n$k"), lit(0L)).cast("double") - d,
          lit(0.0)) / col(s"d$k") +
          (d * col(s"nu$k") / col(s"d$k")) * p)
        .otherwise(p)
    }
    p = when(col("dn").isNotNull,
      greatest(coalesce(col("cn"), lit(0L)).cast("double") - d,
        lit(0.0)) / col("dn") +
        (d * col("nun") / col("dn")) * p)
      .otherwise(p)
    joined
      .join(model.rev, Seq(s"w$n"), "left")
      .withColumn("lp6", round(log(p), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"),
        sum(round(col("lp6") * 1e6).cast("long")).as("__s6"))
      .select(col("doc_id"), col("n_ngrams"),
        round(col("__s6") / (col("n_ngrams") * 1e6), 6).as("avg_logp"))
  }

  /** [[lmGate]] against an order-N [[KnModel]] — identical pass/drop
    * semantics (docs with < order tokens pass: no n-gram, no evidence;
    * raw-id join, never a cast that can fail open).
    */
  def lmGateKn(docs: DataFrame, id: Column, text: Column,
               model: KnModel, minAvgLogp: Double): DataFrame = {
    val scores = scoreKn(docs, id, text, model)
      .select(col("doc_id").as("__lm_id"), col("avg_logp").as("__lm_lp"))
    docs.join(scores, id === col("__lm_id"), "left")
      .filter(col("__lm_lp").isNull || col("__lm_lp") >= minAvgLogp)
      .drop("__lm_id", "__lm_lp")
  }
}
