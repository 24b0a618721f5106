package graft.dedup

import graft.text.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite for large-scale text corpora: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All stages are hash-aggregates and
  * equi-joins — the shapes that scale to 100 TB:
  *
  *  - exact dedup: one shuffle on the md5 fingerprint;
  *  - MinHash: explode(shingles × seeds) is map-side only, then a single
  *    hash-aggregate `min()` per (doc, seed) — partial aggregation collapses
  *    the explosion before the shuffle;
  *  - LSH banding: a second hash-aggregate to band signatures, then a
  *    self-equi-join *on the band signature* — never an all-pairs product;
  *  - SimHash: same explode/aggregate shape with ±1 bit voting.
  *
  * MinHash values are md5 hex strings compared lexicographically (min of k
  * seeded hashes). Hex-string order equals unsigned-integer order of the
  * hash, and is reproducible in any engine with md5 — the property the
  * DuckDB oracle relies on.
  */
object Dedup {

  /** Exact duplicate groups: fingerprint → (canonical doc, group size). */
  def exactGroups(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(fingerprint(text).as("fp"))
      .agg(min(id).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Exact-dedup survivors: the canonical (min-id) row per fingerprint. */
  def exactDedup(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.withColumn("fp", fingerprint(text))
      .join(exactGroups(docs, id, text).select(col("fp"), col("canonical_id")), Seq("fp"))
      .filter(id === col("canonical_id"))
      .drop("fp", "canonical_id")

  /** Long-format MinHash signatures: (id, seed, minhash) for seeds 0..k-1
    * over distinct word shingles.
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame =
    docs.select(id.as("doc_id"), explode(distinctTokens(text)).as("shingle"))
      .crossJoin(spark_seeds(docs, k))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit("|"), col("shingle"))))
        .as("minhash"))

  private def spark_seeds(docs: DataFrame, k: Int): DataFrame =
    docs.sparkSession.range(0, k).toDF("seed")

  /** LSH buckets: band the signature (bandSize seeds per band), hash each
    * band, and report multi-document buckets — the candidate groups.
    * Output: (band, band_sig, n_docs, min_doc, max_doc).
    */
  def lshBuckets(signatures: DataFrame, bandSize: Int): DataFrame =
    signatures
      .withColumn("band", (col("seed") / bandSize).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(array_join(transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
        x => x.getField("minhash")), "|")).as("band_sig"))
      .groupBy(col("band"), col("band_sig"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .filter(col("n_docs") > 1)

  /** Candidate near-duplicate pairs from LSH buckets, with a per-bucket cap
    * to bound the worst-case quadratic blowup of a degenerate bucket
    * (e.g. boilerplate-heavy corpora). Pairs are (a < b), distinct.
    */
  def lshCandidatePairs(signatures: DataFrame, bandSize: Int,
                        maxBucket: Int = 64): DataFrame = {
    val banded = signatures
      .withColumn("band", (col("seed") / bandSize).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(array_join(transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
        x => x.getField("minhash")), "|")).as("band_sig"))
    val small = banded
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "band_sig")))
      .filter(col("bn") <= maxBucket)
    small.as("a").join(small.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Long-format SimHash bits: (id, bit_idx ∈ 1..32, bit ∈ {0,1}).
    * bit_i votes +1 when hex digit i of md5(token) is >= '8' (top bit of the
    * nibble set), −1 otherwise; the sign of the per-document vote sum is the
    * bit. 32 hex digits ⇒ a 32-bit SimHash with 4 bits of hash per digit
    * collapsed to 1 — deterministic and oracle-expressible.
    */
  def simhashBits(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(distinctTokens(text)).as("tok"))
      .withColumn("h", md5(col("tok")))
      .select(col("doc_id"), explode(sequence(lit(1), lit(32))).as("bit_idx"), col("h"))
      .withColumn("vote", when(substr(col("h"), col("bit_idx"), lit(1)) >= "8", 1).otherwise(-1))
      .groupBy("doc_id", "bit_idx")
      .agg((sum(col("vote")) > 0).cast("int").as("bit"))

  /** Exact n-gram Jaccard over character n-gram *sets* for candidate pairs —
    * the verification stage after LSH, or a direct measure on a bounded
    * subset. `docsA`/`docsB` must have (doc_id, text).
    */
  def ngramJaccardPairs(docs: DataFrame, id: Column, text: Column, n: Int,
                        minJaccard: Double, roundTo: Int = 6): DataFrame = {
    val grams = docs.select(id.as("doc_id"),
        explode(array_distinct(charNgrams(text, n))).as("g"))
    val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = grams.as("a").join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard", round(col("inter") /
        (col("sz_a") + col("sz_b") - col("inter")), roundTo))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }
}
