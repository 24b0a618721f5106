package graft.queries

import graft.core.Tables
import graft.ann.Vectors
import graft.ops.Determinism
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over the embeddings table: exact brute-force
  * cosine top-k (baseline) and random-hyperplane LSH bucketing (scale path).
  */
object QVectors {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  private val Dim = 64
  private val NPlanes = 8
  // PQ geometry: 8 subspaces of 8 dims over the 64-dim embeddings;
  // codebooks from every 25th vector (pqCodebooksStep's oracle rule)
  private val PqM = 8
  private val PqStep = 25

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // V1: exact cosine top-5 for a bounded query set (broadcast NL + window).
    "v1_cosine_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Vectors.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 5)
    }),

    // V2: LSH bucket histogram (deterministic pseudo-hyperplanes).
    "v2_lsh_histogram" -> ((s, d) =>
      Vectors.lshBucketHistogram(t(s, d, "embeddings"), "vec_id", "embedding",
        NPlanes, Dim)),

    // V4: the LSH-bucketed approximate top-k — the scale path of V1: the
    // corpus is joined to queries ONLY within matching hyperplane buckets
    // (equi-join on the bit signature, never all-pairs).
    "v4_lsh_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Vectors.lshBucketTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 5, NPlanes, Dim)
    }),

    // V5: IVF-style approximate top-k — coarse-quantizer cells (every
    // 50th vector is a centroid), queries probe their own cell only.
    "v5_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Vectors.ivfTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 5, 50)
    }),

    // V6: IVF with multi-probe — each query scores its 2 highest-cosine
    // cells (recall lever over v5's single-cell probe; cost linear in
    // nprobe, the scoring join stays equi on cell).
    "v6_ivf_nprobe" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Vectors.ivfTopKProbes(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 5, 50, nprobe = 2)
    }),

    // V7: recall@5 of the LSH scale path against the exact baseline —
    // the evaluation loop an ANN deployment runs before trusting its
    // approximate index. Per query: |lsh top-5 ∩ brute top-5| / 5.
    "v7_lsh_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val brute = Vectors.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id"))
      val lsh = Vectors.lshBucketTopK(emb, q, "vec_id", "embedding", 5, NPlanes, Dim)
        .select(col("query_id"), col("vec_id"), lit(1).as("__hit"))
      brute.join(lsh, Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1)), 6).as("recall"))
    }),

    // V9: recall@5 of the k-means-quantized IVF path (trained coarse
    // quantizer, Vectors.kmeansCentroids) against the exact baseline —
    // the v7 harness pointed at the production quantizer. Rows-only
    // (documented like a11): Lloyd's means are not oracle-expressible in
    // closed-form SQL; VectorsSpec asserts the recall ordering
    // (k-means >= the every-step-th rule at equal cell count) instead.
    "v9_kmeans_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val brute = Vectors.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id"))
      val km = Vectors.ivfTopKKmeans(emb, q, "vec_id", "embedding", 5,
          numCents = 16, nprobe = 2)
        .select(col("query_id"), col("vec_id"), lit(1).as("__hit"))
      brute.join(km, Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1)), 6).as("recall"))
    }),

    // V10: int8 scalar quantization round-trip error — quantize every
    // embedding to int8 (the 4×-smaller storage path an ANN index scans at
    // 100 TB), dequantize, and report per-vector max/mean absolute
    // reconstruction error. Bounds the recall loss of quantized search.
    "v10_quantize_error" -> ((s, d) => {
      val v = Vectors.asDouble(col("embedding"))
      val e = t(s, d, "embeddings").select(col("vec_id"), v.as("v"))
        .withColumn("mn", array_min(col("v")))
        .withColumn("sc", (array_max(col("v")) - col("mn")) / lit(255.0))
        .withColumn("q", Vectors.quantizeInt8(col("v")))
        .withColumn("dq", Vectors.dequantizeInt8(col("q"), col("mn"), col("sc")))
        .withColumn("err", zip_with(col("v"), col("dq"), (a, b) => abs(a - b)))
      e.select(col("vec_id"),
        round(array_max(col("err")), 6).as("max_abs_err"),
        round(aggregate(col("err"), lit(0.0), (acc, x) => acc + x) /
          size(col("err")), 6).as("mean_abs_err"))
    }),

    // V3: embedding-cosine near-duplicate pairs above a threshold within a
    // bounded id range (embedding near-dup detection shape).
    "v3_cosine_neardup" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("vec_id") < 128)
        .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
        .withColumn("vn", Vectors.l2norm(col("v")))
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .withColumn("cos", Vectors.dot(col("a.v"), col("b.v")) / (col("a.vn") * col("b.vn")))
        .filter(col("cos") > 0.5)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(col("cos"), 6).as("cosine"))
    }),

    // V8: SemDeDup-style semantic near-dup pairs — IVF-cell assignment
    // bounds the pair search to within-cell (equi-join on cell, never the
    // corpus square); exact cosine >= 0.4 inside each cell. maxCell=512
    // drops degenerate hot cells (mirrored by the oracle's QUALIFY-style
    // cell-count filter); VectorsSpec exercises the cap with an actually
    // oversized cell.
    "v8_semantic_dedup" -> ((s, d) =>
      Vectors.semanticNearDupPairs(t(s, d, "embeddings"),
        "vec_id", "embedding", 50, 0.4, maxCell = 512)),

    // V16: INCREMENTAL semantic dedup — the day-2 form of v8: the corpus
    // split into an existing index (vec_id >= 40, quantized by its own
    // step centroids) and today's shard (< 40); pairs are shard×index +
    // shard×shard within the shard's cells only, never old×old. The
    // persisted-index form of the same operator is exercised in
    // BucketingSpec; this oracle pins the pair semantics.
    "v16_incremental_semantic" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val index = emb.filter(col("vec_id") >= 40)
      val shard = emb.filter(col("vec_id") < 40)
      val cents = Vectors.stepCentroids(index, "vec_id", "embedding", 50)
      Vectors.incrementalSemanticPairs(shard, "vec_id", "embedding", cents,
        Vectors.semanticIndex(index, "vec_id", "embedding", cents),
        minCosine = 0.4, maxCell = 512)
    }),

    // V17: semantic-index CELL OCCUPANCY — the index-health view the
    // maintenance loop reads: per-cell vector counts plus whether the
    // cell would be dropped by the semantic-dedup cap (maxCell 512) or
    // deserves a re-train (a hot cell means the frozen quantizer no
    // longer matches the embedding distribution). Rides the index's
    // natural (cell) partitioning — on the persisted bucketed table this
    // aggregate needs no exchange at all (BucketingSpec's bucket-agg
    // assertion).
    "v17_cell_occupancy" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Vectors.stepCentroids(emb, "vec_id", "embedding", 50)
      Vectors.semanticIndex(emb, "vec_id", "embedding", cents)
        .groupBy("cell")
        .agg(count(lit(1)).as("n_vectors"))
        .withColumn("over_cap", col("n_vectors") > 512)
    }),

    // V18: PROTOTYPICALITY pruning (the D4 / SSL-prototypes move —
    // SemDeDup's complement): near-duplicate *regions* of embedding
    // space, not just near-duplicate pairs, are redundant for training,
    // so within each IVF cell the vectors MOST similar to their own
    // centroid (the prototypical core every crawl over-represents) are
    // marked for pruning — top 20% per cell by cosine-to-centroid,
    // ties broken by vec_id. One join against the broadcast centroid
    // set + one per-cell window; on the persisted cell-bucketed index
    // the window needs no exchange at all. Emits the full audit view
    // (vec_id, cell, proto, pruned) rather than just survivors, so the
    // curation report can histogram prototypicality per cell.
    "v18_prototypicality" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Vectors.prototypicalityPrune(emb, "vec_id", "embedding",
        Vectors.stepCentroids(emb, "vec_id", "embedding", 50),
        pruneFraction = 0.2)
    }),

    // V19: HARD-NEGATIVE mining — per query, the top-3 same-cell vectors
    // with cosine in [0.05, 0.5): the contrastive-training negatives that
    // are informative (similar) but safely below the positive/near-dup
    // band. Cell-bounded like v5; the band filter runs before the top-k
    // window on the rounded cosine.
    "v19_hard_negatives" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Vectors.hardNegatives(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 3, step = 50,
        loCos = 0.05, hiCos = 0.5)
    }),

    // V21: SEMANTIC contamination — train vectors embedding next to an
    // eval vector (cosine ≥ 0.3 within shared cells): the paraphrased-
    // benchmark-leakage check n-gram decontamination (d8) cannot see.
    // Eval = vec_id < 20 stands in for the benchmark split (the d8
    // convention); centroids frozen from the train side.
    "v21_semantic_contamination" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val train = emb.filter(col("vec_id") >= 20)
      val eval = emb.filter(col("vec_id") < 20)
      Vectors.semanticContaminatedIds(train, "vec_id", "embedding",
        eval, "vec_id", "embedding",
        Vectors.stepCentroids(train, "vec_id", "embedding", 50),
        minCosine = 0.3)
    }),

    // V20: JL random-projection DISTORTION — cosine in the original
    // 64-dim space vs the 16-plane projected space for all pairs of a
    // bounded id range, with the absolute error. The measurement that
    // justifies (or vetoes) running the cheap 4×-narrower pre-filter
    // scan at 100 TB; the projection itself is a pure codegen'd per-row
    // map (no shuffle).
    "v20_jl_distortion" -> ((s, d) => {
      val emb = t(s, d, "embeddings").filter(col("vec_id") < 48)
      val orig = emb.select(col("vec_id"),
          Vectors.asDouble(col("embedding")).as("v"))
        .withColumn("vn", Vectors.l2norm(col("v")))
      val proj = Vectors.projectRandom(emb, "vec_id", "embedding", 16, Dim)
        .withColumn("pn", Vectors.l2norm(col("proj")))
      val e = orig.join(proj, "vec_id")
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(Vectors.dot(col("a.v"), col("b.v"))
            / (col("a.vn") * col("b.vn")), 6).as("cos_orig"),
          round(Vectors.dot(col("a.proj"), col("b.proj"))
            / (col("a.pn") * col("b.pn")), 6).as("cos_proj"))
        .withColumn("abs_err", round(abs(col("cos_orig") - col("cos_proj")), 6))
    }),

    // V11: product-quantization reconstruction error vs the int8 scalar
    // path — PQ at m=8 over 64 dims stores 8 bytes/vector (32× smaller
    // than float32, 4× smaller than v10's int8) for a measured MSE cost.
    // Codebooks from the oracle-expressible every-25th rule
    // (pqCodebooksStep); the trained pqTrain variant is property-tested
    // in VectorsSpec against this same error metric.
    "v11_pq_error" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val books = Vectors.pqCodebooksStep(emb, "vec_id", "embedding", PqM, PqStep)
      val pq = Vectors.pqReconstructionMse(emb, "vec_id", "embedding", books, PqM)
      val v = Vectors.asDouble(col("embedding"))
      val sq = emb
        .select(col("vec_id"), v.as("v"),
          array_min(v).as("mn"),
          ((array_max(v) - array_min(v)) / lit(255.0)).as("sc"))
        .withColumn("dq", Vectors.dequantizeInt8(
          Vectors.quantizeInt8(col("v")), col("mn"), col("sc")))
        .select(col("vec_id"),
          round(graft.ops.Stats.arrayMse(col("v"), col("dq")), 6).as("sq_mse"))
      pq.join(sq, "vec_id")
    }),

    // V12: recall@5 of ADC-scored PQ top-k against the exact cosine
    // baseline — the v7 harness pointed at the PQ index: queries stay
    // un-quantized, corpus vectors are scored by m table lookups over
    // their codes (equi-join on (sub, cell), never a float re-scan).
    "v12_pq_adc_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 8)
      val books = Vectors.pqCodebooksStep(emb, "vec_id", "embedding", PqM, PqStep)
      val brute = Vectors.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id"))
      val adc = Vectors.pqAdcTopK(emb, q, "vec_id", "embedding", books, PqM, 5)
        .select(col("query_id"), col("vec_id"), lit(1).as("__hit"))
      brute.join(adc, Seq("query_id", "vec_id"), "left")
        .groupBy("query_id")
        .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") /
          count(lit(1)), 6).as("recall"))
    }),

    // V13: IVF-PQ — the FAISS-style production index: coarse cells (v5's
    // every-50th quantizer) bound WHERE to look, PQ codes bound WHAT is
    // stored, ADC scores only the probed cells' codes. Work per query =
    // nprobe × cell × m lookups; floats never rescanned.
    "v13_ivfpq_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val books = Vectors.pqCodebooksStep(emb, "vec_id", "embedding", PqM, PqStep)
      Vectors.ivfPqTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        step = 50, books, PqM, 5, nprobe = 2)
    }),

    // V14: RESIDUAL IVF-PQ — v13 with each vector PQ-encoded as its
    // residual against its coarse centroid (Jégou et al. 2011 §IV), the
    // accuracy detail production IVF-PQ deployments run. Codebooks come
    // from the every-25th rule applied to the RESIDUAL relation, so the
    // whole composition (coarse assign → residual → residual codebooks →
    // encode → probed residual-ADC query) stays oracle-expressible.
    "v14_ivfpq_residual_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = Vectors.stepCentroids(emb, "vec_id", "embedding", 50)
      val res = Vectors.residuals(emb, "vec_id", "embedding", cents)
      val books = Vectors.pqCodebooksStep(res, "vec_id", "resid", PqM, PqStep)
      val idx = Vectors.ivfPqResidualIndex(emb, "vec_id", "embedding",
        cents, books, PqM)
      Vectors.ivfPqResidualTopKFromIndex(idx, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", cents, books, PqM, 5, nprobe = 2)
    }),

    // V15: INCREMENTAL index ingest under the oracle — build the bucketed
    // IVF-PQ index from a BASE corpus (vec_id % 7 != 0), freeze its
    // quantizers, append the shard (every 7th vector) with
    // appendToIvfPqIndex (drift-guarded against the base's recorded MSE),
    // and query the persisted table. The oracle is v13's composition with
    // the base predicate on the cb/icents CTEs — append-then-query must
    // equal training-frozen-quantizers-then-encoding-everything.
    "v15_ivfpq_append_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") % 7 =!= 0)
      val shard = emb.filter(col("vec_id") % 7 === 0)
      val cents = Vectors.stepCentroids(base, "vec_id", "embedding", 50)
      val books = Vectors.pqCodebooksStep(base, "vec_id", "embedding", PqM, PqStep)
      val tbl = "graft_v15_ivfpq"
      val baseMse = Vectors.meanPqMse(base, "vec_id", "embedding", books, PqM)
      Vectors.writeIvfPqIndex(
        Vectors.ivfPqIndex(base, "vec_id", "embedding", cents, books, PqM),
        tbl, buckets = 8)
      Vectors.appendToIvfPqIndex(tbl, shard, "vec_id", "embedding",
        cents, books, PqM, baselineMse = baseMse, buckets = 8)
      Vectors.ivfPqTopKFromIndex(Vectors.readIvfPqIndex(s, tbl),
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        cents, books, PqM, 5, nprobe = 2)
    }),

    // V22: quantizer-refresh drift view — the before/after evidence for
    // [[Vectors.refreshIvfPq]]: an index built with STALE quantizers (step
    // rules drawn from the base distribution only, v15's frozen-codebook
    // setup) is epoch-swapped to quantizers re-drawn from the CURRENT
    // corpus. One row per regime with the corpus-mean PQ reconstruction
    // MSE — a fixed-point mean of the 6dp per-vector MSEs (sum of exact
    // integers, one division, one rounding), the d16 discipline: a
    // cross-engine mean of raw doubles is summation-order-sensitive in
    // the last ulp. The refreshed row's n_vecs is counted FROM THE LIVE
    // SWAPPED TABLE (distinct vec_id), so the query fails loudly if the
    // epoch swap didn't land; refresh must strictly lower the mean MSE
    // (asserted in BucketingSpec; visible in the row values here).
    "v22_refresh_drift" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") % 7 =!= 0)
      val staleCents = Vectors.stepCentroids(base, "vec_id", "embedding", 50)
      val staleBooks = Vectors.pqCodebooksStep(base, "vec_id", "embedding",
        PqM, PqStep)
      val tbl = "graft_v22_ivfpq"
      Vectors.writeIvfPqIndex(
        Vectors.ivfPqIndex(base, "vec_id", "embedding", staleCents,
          staleBooks, PqM), tbl, buckets = 8)
      val newCents = Vectors.stepCentroids(emb, "vec_id", "embedding", 50)
      val newBooks = Vectors.pqCodebooksStep(emb, "vec_id", "embedding",
        PqM, PqStep)
      Vectors.refreshIvfPq(s, tbl, emb, "vec_id", "embedding",
        newCents, newBooks, PqM, buckets = 8)
      def regime(name: String, books: DataFrame, nVecs: DataFrame): DataFrame =
        Vectors.pqReconstructionMse(emb, "vec_id", "embedding", books, PqM)
          .agg(sum(round(col("pq_mse") * 1e6).cast("long")).as("__fp"),
            count(lit(1)).as("__n"))
          .crossJoin(broadcast(nVecs))
          .select(lit(name).as("regime"),
            round(col("__fp") / col("__n") / lit(1e6), 6).as("mean_mse"),
            col("n_vecs"))
      regime("stale", staleBooks, emb.agg(count(lit(1)).as("n_vecs")))
        .union(regime("refreshed", newBooks,
          s.table(tbl).agg(countDistinct(col("vec_id")).as("n_vecs"))))
    }),

    // V23: the v22 twin for the SEMANTIC (SemDeDup) index — evidence for
    // refreshSemanticIndex under a full oracle: an index assigned with
    // STALE centroids (step rule over the base distribution) is
    // epoch-swapped under centroids re-drawn from the current corpus; one
    // row per regime with the corpus-mean cosine-to-assigned-centroid
    // (fixed-point mean of the 6dp per-row cosines). The refreshed row is
    // computed FROM THE LIVE SWAPPED TABLE — its (v, vn, cell) columns
    // joined back to the new centroids — so both the re-assignment and
    // the swap are what the oracle checks; refresh must raise the mean
    // (cells fit the current distribution better).
    "v23_semantic_refresh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val base = emb.filter(col("vec_id") % 7 =!= 0)
      val staleCents = Vectors.stepCentroids(base, "vec_id", "embedding", 50)
      val tbl = "graft_v23_sem"
      Vectors.writeSemanticIndex(emb, "vec_id", "embedding", staleCents,
        tbl, 8)
      val newCents = Vectors.stepCentroids(emb, "vec_id", "embedding", 50)
      Vectors.refreshSemanticIndex(s, tbl, emb, "vec_id", "embedding",
        newCents, buckets = 8)
      def meanCos(idx: DataFrame, cents: DataFrame, name: String): DataFrame =
        idx.join(broadcast(cents), idx("cell") === cents("cent_id"))
          .select((Vectors.dot(col("v"), col("cv"))
            / (col("vn") * col("cvn"))).as("__cos"))
          .agg(sum(round(col("__cos") * 1e6).cast("long")).as("__fp"),
            count(lit(1)).as("__n"))
          .select(lit(name).as("regime"),
            round(col("__fp") / col("__n") / lit(1e6), 6).as("mean_cos"),
            col("__n").as("n_vecs"))
      meanCos(Vectors.semanticIndex(emb, "vec_id", "embedding", staleCents),
          staleCents, "stale")
        .union(meanCos(s.table(tbl), newCents, "refreshed"))
    }))

  /** DuckDB fragment: hyperplane p as a DOUBLE[] expression recomputing the
    * same md5-derived components as [[Vectors.hyperplane]].
    */
  private def planeSql(p: Int): String =
    s"list_transform(range(0, $Dim), k -> " +
      s"${Determinism.detRandSql(s"($p * $Dim + k)")} - 0.5)"

  /** DuckDB CTE chain shared by the v11/v12 PQ oracles (one definition so
    * they cannot drift): `e` (vectors), `sub` (m contiguous sub-vectors),
    * `cb` (every-PqStep-th codebooks), `asg` (min-L2 assignment with the
    * engine's exact dot-product decomposition, −0.0 normalization, and
    * cent_id tie-break).
    */
  private def pqSqlFrom(basePred: String): String = {
    val subDim = Dim / PqM
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              psub AS (SELECT vec_id, u.sub AS sub, u.sv AS sv FROM (
                        SELECT vec_id, unnest(list_transform(range(0, $PqM),
                          j -> {'sub': CAST(j AS INT),
                                'sv': v[CAST(j * $subDim + 1 AS INT):CAST(j * $subDim + $subDim AS INT)]})) AS u
                        FROM e)),
              cb AS (SELECT sub, vec_id AS cent_id, sv AS cv
                     FROM psub WHERE vec_id % $PqStep = 0 AND ($basePred)),
              pdist AS (SELECT s.vec_id, s.sub, c.cent_id,
                               list_dot_product(s.sv, s.sv)
                                 - 2.0 * list_dot_product(s.sv, c.cv)
                                 + list_dot_product(c.cv, c.cv) AS d
                        FROM psub s JOIN cb c USING (sub)),
              asg AS (SELECT vec_id, sub, cent_id, d FROM (
                        SELECT vec_id, sub, cent_id, d,
                               row_number() OVER (PARTITION BY vec_id, sub
                                 ORDER BY d + 0.0, cent_id) AS rn
                        FROM pdist) WHERE rn = 1)"""
  }

  private val pqSql: String = pqSqlFrom("TRUE")

  /** The full IVF-PQ probed-ADC oracle (v13's composition), parametrized
    * on the predicate defining which vectors the QUANTIZERS (PQ codebooks
    * and coarse centroids) are drawn from. "TRUE" = trained on the whole
    * corpus (v13); a base predicate = frozen-from-base quantizers, i.e.
    * the incremental-append semantics (v15). Assignment/encoding always
    * covers ALL vectors — exactly what append-then-query produces.
    */
  private def ivfPqOracleSql(basePred: String): String =
    s"""WITH ${pqSqlFrom(basePred)},
              codes AS (SELECT vec_id, sub, cent_id AS cell FROM asg),
              cn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn FROM e),
              icents AS (SELECT vec_id AS icent, v AS cv, vn AS cvn
                         FROM cn WHERE vec_id % 50 = 0 AND ($basePred)),
              ica AS (SELECT vec_id, ivf_cell FROM (
                        SELECT cn.vec_id, icent AS ivf_cell,
                               row_number() OVER (PARTITION BY cn.vec_id
                                 ORDER BY list_dot_product(cn.v, cv) / (cn.vn * cvn) + 0.0 DESC,
                                          icent) AS rk
                        FROM cn, icents) WHERE rk = 1),
              qp AS (SELECT query_id, ivf_cell FROM (
                       SELECT cn.vec_id AS query_id, icent AS ivf_cell,
                              row_number() OVER (PARTITION BY cn.vec_id
                                ORDER BY list_dot_product(cn.v, cv) / (cn.vn * cvn) + 0.0 DESC,
                                         icent) AS pr
                       FROM cn, icents WHERE cn.vec_id < 8) WHERE pr <= 2),
              qs AS (SELECT vec_id AS query_id, sub, sv FROM psub WHERE vec_id < 8),
              tbl AS (SELECT q.query_id, q.sub, c.cent_id AS cell,
                             list_dot_product(q.sv, q.sv)
                               - 2.0 * list_dot_product(q.sv, c.cv)
                               + list_dot_product(c.cv, c.cv) AS part
                      FROM qs q JOIN cb c USING (sub)),
              ad AS (SELECT t.query_id, k.vec_id, list(t.part ORDER BY t.sub) AS plist
                     FROM codes k
                     JOIN ica ON k.vec_id = ica.vec_id
                     JOIN qp ON ica.ivf_cell = qp.ivf_cell
                     JOIN tbl t ON t.query_id = qp.query_id
                       AND k.sub = t.sub AND k.cell = t.cell
                     WHERE k.vec_id != qp.query_id
                     GROUP BY 1, 2),
              ads AS (SELECT query_id, vec_id,
                             round(list_dot_product(plist,
                               list_transform(plist, x -> 1.0)), 6) AS adist
                      FROM ad)
          SELECT query_id, vec_id, adist, CAST(rk AS INT) AS rk FROM (
            SELECT query_id, vec_id, adist,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY adist, vec_id) AS rk
            FROM ads) WHERE rk <= 5"""

  /** v9's Lloyd's loop, UNROLLED (iters = 3, seed = 42 are fixed in the
    * query) — the round-9 verdict's "attempt a v9 oracle": no recursion
    * needed, each iteration is assign (argmax cosine, min-cent-id
    * tie-break, the v6 pattern) → per-(cell, coordinate) rounded means →
    * empty cells keep their previous centroid.
    */
  private def v9IterSql(n: Int): String = {
    val prev = if (n == 1) "cents0" else s"cents${n - 1}"
    s"""a$n AS (SELECT vec_id, cell FROM (
             SELECT c.vec_id, cent_id AS cell,
                    row_number() OVER (PARTITION BY c.vec_id
                      ORDER BY list_dot_product(c.v, cv)
                        / (c.vn * sqrt(list_dot_product(cv, cv))) + 0.0 DESC,
                        cent_id) AS rk
             FROM c, $prev) WHERE rk = 1),
        ex$n AS (SELECT cell, v,
               unnest(generate_series(1, len(v))) AS p
             FROM a$n JOIN c USING (vec_id)),
        m$n AS (SELECT cell, p, round(avg(v[CAST(p AS INT)]), 6) AS m
             FROM ex$n GROUP BY cell, p),
        cents$n AS (SELECT i.cent_id, coalesce(mm.mv, i.cv) AS cv
             FROM $prev i LEFT JOIN (
               SELECT cell, list(m ORDER BY p) AS mv FROM m$n GROUP BY cell) mm
               ON mm.cell = i.cent_id)"""
  }

  private val v9Sql: String = {
    val hash = graft.ops.Determinism.detHashSql("vec_id + 42")
    s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
             FROM embeddings),
        cents0 AS (SELECT CAST(rk - 1 AS BIGINT) AS cent_id, v AS cv FROM (
             SELECT v, row_number() OVER (ORDER BY h, vec_id) AS rk
             FROM (SELECT vec_id, v, $hash AS h FROM c)) WHERE rk <= 16),
        ${v9IterSql(1)},
        ${v9IterSql(2)},
        ${v9IterSql(3)},
        cents AS (SELECT cent_id, cv,
                    sqrt(list_dot_product(cv, cv)) AS cvn FROM cents3),
        ca AS (SELECT vec_id, v, vn, cell FROM (
             SELECT c.vec_id, c.v, c.vn, cent_id AS cell,
                    row_number() OVER (PARTITION BY c.vec_id
                      ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                        cent_id) AS rk
             FROM c, cents) WHERE rk = 1),
        qa AS (SELECT query_id, q, qn, cell FROM (
             SELECT c.vec_id AS query_id, c.v AS q, c.vn AS qn, cent_id AS cell,
                    row_number() OVER (PARTITION BY c.vec_id
                      ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                        cent_id) AS pr
             FROM c, cents WHERE c.vec_id < 8) WHERE pr <= 2),
        km AS (SELECT query_id, vec_id FROM (
             SELECT query_id, ca.vec_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY list_dot_product(ca.v, qa.q) / (ca.vn * qa.qn) DESC,
                        ca.vec_id) AS rk
             FROM ca JOIN qa USING (cell) WHERE ca.vec_id != qa.query_id)
             WHERE rk <= 5),
        brute AS (SELECT query_id, vec_id FROM (
             SELECT q.query_id, c.vec_id,
                    row_number() OVER (PARTITION BY q.query_id
                      ORDER BY list_dot_product(c.v, q.q) / (c.vn * q.qn) DESC,
                        c.vec_id) AS rk
             FROM c, (SELECT vec_id AS query_id, v AS q, vn AS qn FROM c
                      WHERE vec_id < 8) q
             WHERE c.vec_id != q.query_id) WHERE rk <= 5)
      SELECT b.query_id,
             round(CAST(sum(CASE WHEN k.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*), 6) AS recall
      FROM brute b LEFT JOIN km k
        ON k.query_id = b.query_id AND k.vec_id = b.vec_id
      GROUP BY b.query_id"""
  }

  def oracle: Map[String, String] = Map(
    "v9_kmeans_recall" -> v9Sql,
    // v22: stale chain = pqSqlFrom(base predicate) exactly as v15's frozen
    // codebooks; refreshed chain = the same CTEs re-drawn over the full
    // corpus. Per-vector MSE mirrors v11's pqm (ordered-list dot / Dim,
    // 6dp); the regime mean is the fixed-point form (sum of exact BIGINTs,
    // one division, one rounding) so it is summation-order-insensitive
    // across engines.
    "v22_refresh_drift" ->
      s"""WITH ${pqSqlFrom("vec_id % 7 != 0")},
              pm_s AS (SELECT vec_id,
                              round(list_dot_product(dl, list_transform(dl, x -> 1.0))
                                / $Dim, 6) AS pq_mse
                       FROM (SELECT vec_id, list(d ORDER BY sub) AS dl
                             FROM asg GROUP BY vec_id) t),
              cb2 AS (SELECT sub, vec_id AS cent_id, sv AS cv
                      FROM psub WHERE vec_id % $PqStep = 0),
              pd2 AS (SELECT s.vec_id, s.sub, c.cent_id,
                             list_dot_product(s.sv, s.sv)
                               - 2.0 * list_dot_product(s.sv, c.cv)
                               + list_dot_product(c.cv, c.cv) AS d
                      FROM psub s JOIN cb2 c USING (sub)),
              asg2 AS (SELECT vec_id, sub, d FROM (
                         SELECT vec_id, sub, d,
                                row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d + 0.0, cent_id) AS rn
                         FROM pd2) t WHERE rn = 1),
              pm_n AS (SELECT vec_id,
                              round(list_dot_product(dl, list_transform(dl, x -> 1.0))
                                / $Dim, 6) AS pq_mse
                       FROM (SELECT vec_id, list(d ORDER BY sub) AS dl
                             FROM asg2 GROUP BY vec_id) t),
              nv AS (SELECT count(*) AS n_vecs FROM e)
          SELECT 'stale' AS regime,
                 round(CAST(sum(CAST(round(pq_mse * 1e6) AS BIGINT)) AS DOUBLE)
                   / (SELECT n_vecs FROM nv) / 1e6, 6) AS mean_mse,
                 (SELECT n_vecs FROM nv) AS n_vecs
          FROM pm_s
          UNION ALL
          SELECT 'refreshed' AS regime,
                 round(CAST(sum(CAST(round(pq_mse * 1e6) AS BIGINT)) AS DOUBLE)
                   / (SELECT n_vecs FROM nv) / 1e6, 6) AS mean_mse,
                 (SELECT n_vecs FROM nv) AS n_vecs
          FROM pm_n""",
    // v23: per-row cosine of the CHOSEN centroid (the v5 `ca` pattern —
    // +0.0-normalized DESC order with cent_id tie-break, raw value), per
    // quantizer regime; regime mean as the fixed-point form.
    "v23_semantic_refresh" ->
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                            sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                     FROM embeddings),
              cents_s AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                          FROM c WHERE vec_id % 50 = 0 AND vec_id % 7 != 0),
              cents_n AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                          FROM c WHERE vec_id % 50 = 0),
              cos_s AS (SELECT vec_id, cos FROM (
                          SELECT c.vec_id,
                                 list_dot_product(c.v, cv) / (c.vn * cvn) AS cos,
                                 row_number() OVER (PARTITION BY c.vec_id
                                   ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                            cent_id) AS rk
                          FROM c, cents_s) t WHERE rk = 1),
              cos_n AS (SELECT vec_id, cos FROM (
                          SELECT c.vec_id,
                                 list_dot_product(c.v, cv) / (c.vn * cvn) AS cos,
                                 row_number() OVER (PARTITION BY c.vec_id
                                   ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                            cent_id) AS rk
                          FROM c, cents_n) t WHERE rk = 1),
              nv AS (SELECT count(*) AS n_vecs FROM c)
          SELECT 'stale' AS regime,
                 round(CAST(sum(CAST(round(cos * 1e6) AS BIGINT)) AS DOUBLE)
                   / (SELECT n_vecs FROM nv) / 1e6, 6) AS mean_cos,
                 (SELECT n_vecs FROM nv) AS n_vecs
          FROM cos_s
          UNION ALL
          SELECT 'refreshed' AS regime,
                 round(CAST(sum(CAST(round(cos * 1e6) AS BIGINT)) AS DOUBLE)
                   / (SELECT n_vecs FROM nv) / 1e6, 6) AS mean_cos,
                 (SELECT n_vecs FROM nv) AS n_vecs
          FROM cos_n""",
    "v11_pq_error" ->
      s"""WITH $pqSql,
              pl AS (SELECT vec_id, list(d ORDER BY sub) AS dl
                     FROM asg GROUP BY vec_id),
              pqm AS (SELECT vec_id,
                             round(list_dot_product(dl, list_transform(dl, x -> 1.0))
                               / $Dim, 6) AS pq_mse
                      FROM pl),
              sq0 AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx,
                             (list_max(v) - list_min(v)) / 255.0 AS sc
                      FROM e),
              sq1 AS (SELECT vec_id, v, mn, sc,
                             CASE WHEN mx = mn THEN list_transform(v, x -> -128)
                                  ELSE list_transform(v,
                                    x -> CAST(round((x - mn) / sc) AS INT) - 128) END AS qv
                      FROM sq0),
              sq2 AS (SELECT vec_id, v,
                             list_transform(qv, i -> mn + (i + 128) * sc) AS dq
                      FROM sq1),
              sqm AS (SELECT vec_id,
                             round((list_dot_product(v, v) - 2.0 * list_dot_product(v, dq)
                               + list_dot_product(dq, dq)) / len(v), 6) AS sq_mse
                      FROM sq2)
          SELECT p.vec_id, p.pq_mse, s.sq_mse
          FROM pqm p JOIN sqm s ON p.vec_id = s.vec_id""",
    "v12_pq_adc_recall" ->
      s"""WITH $pqSql,
              codes AS (SELECT vec_id, sub, cent_id AS cell FROM asg),
              qs AS (SELECT vec_id AS query_id, sub, sv FROM psub WHERE vec_id < 8),
              tbl AS (SELECT q.query_id, q.sub, c.cent_id AS cell,
                             list_dot_product(q.sv, q.sv)
                               - 2.0 * list_dot_product(q.sv, c.cv)
                               + list_dot_product(c.cv, c.cv) AS part
                      FROM qs q JOIN cb c USING (sub)),
              ad AS (SELECT t.query_id, k.vec_id, list(t.part ORDER BY t.sub) AS plist
                     FROM codes k JOIN tbl t ON k.sub = t.sub AND k.cell = t.cell
                     WHERE k.vec_id != t.query_id
                     GROUP BY 1, 2),
              ads AS (SELECT query_id, vec_id,
                             round(list_dot_product(plist,
                               list_transform(plist, x -> 1.0)), 6) AS adist
                      FROM ad),
              adc5 AS (SELECT query_id, vec_id FROM (
                         SELECT query_id, vec_id,
                                row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist, vec_id) AS rk
                         FROM ads) WHERE rk <= 5),
              cn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn FROM e),
              qn AS (SELECT vec_id AS query_id, v AS qv, vn AS qvn
                     FROM cn WHERE vec_id < 8),
              sc AS (SELECT query_id, cn.vec_id,
                            list_dot_product(cn.v, qv) / (cn.vn * qvn) AS cos
                     FROM cn, qn WHERE cn.vec_id != query_id),
              br AS (SELECT query_id, vec_id FROM (
                       SELECT query_id, vec_id,
                              row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id) AS rk
                       FROM sc) WHERE rk <= 5)
          SELECT b.query_id,
                 round(CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS DOUBLE) / count(*), 6) AS recall
          FROM br b LEFT JOIN adc5 a
            ON b.query_id = a.query_id AND b.vec_id = a.vec_id
          GROUP BY b.query_id""",
    "v13_ivfpq_topk" -> ivfPqOracleSql("TRUE"),
    // v15: the SAME probed-ADC composition, but codebooks and coarse
    // centroids frozen from the BASE corpus (vec_id % 7 != 0) — the
    // incremental-append semantics of Vectors.appendToIvfPqIndex: the
    // shard (every 7th vector) is encoded against the frozen quantizers,
    // so append-then-query over base+shard is exactly this SQL.
    "v15_ivfpq_append_topk" -> ivfPqOracleSql("vec_id % 7 != 0"),
    "v14_ivfpq_residual_topk" -> {
      val subDim = Dim / PqM
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                            sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                     FROM embeddings),
              icents AS (SELECT vec_id AS icent, v AS cv, vn AS cvn
                         FROM c WHERE vec_id % 50 = 0),
              ica AS (SELECT vec_id, ivf_cell FROM (
                        SELECT c.vec_id, icent AS ivf_cell,
                               row_number() OVER (PARTITION BY c.vec_id
                                 ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                          icent) AS rk
                        FROM c, icents) WHERE rk = 1),
              res AS (SELECT c.vec_id, ica.ivf_cell,
                             list_transform(range(1, len(c.v) + 1),
                               j -> c.v[CAST(j AS INT)] - icents.cv[CAST(j AS INT)]) AS rv
                      FROM c JOIN ica ON c.vec_id = ica.vec_id
                             JOIN icents ON ica.ivf_cell = icents.icent),
              rsub AS (SELECT vec_id, u.sub AS sub, u.sv AS sv FROM (
                         SELECT vec_id, unnest(list_transform(range(0, $PqM),
                           j -> {'sub': CAST(j AS INT),
                                 'sv': rv[CAST(j * $subDim + 1 AS INT):CAST(j * $subDim + $subDim AS INT)]})) AS u
                         FROM res)),
              rcb AS (SELECT sub, vec_id AS cent_id, sv AS cv
                      FROM rsub WHERE vec_id % $PqStep = 0),
              rdist AS (SELECT s.vec_id, s.sub, cb.cent_id,
                               list_dot_product(s.sv, s.sv)
                                 - 2.0 * list_dot_product(s.sv, cb.cv)
                                 + list_dot_product(cb.cv, cb.cv) AS d
                        FROM rsub s JOIN rcb cb USING (sub)),
              codes AS (SELECT vec_id, sub, cent_id AS cell FROM (
                          SELECT vec_id, sub, cent_id,
                                 row_number() OVER (PARTITION BY vec_id, sub
                                   ORDER BY d + 0.0, cent_id) AS rn
                          FROM rdist) WHERE rn = 1),
              qp AS (SELECT query_id, ivf_cell FROM (
                       SELECT c.vec_id AS query_id, icent AS ivf_cell,
                              row_number() OVER (PARTITION BY c.vec_id
                                ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                         icent) AS pr
                       FROM c, icents WHERE c.vec_id < 8) WHERE pr <= 2),
              qres AS (SELECT qp.query_id, qp.ivf_cell,
                              list_transform(range(1, len(c.v) + 1),
                                j -> c.v[CAST(j AS INT)] - icents.cv[CAST(j AS INT)]) AS qrv
                       FROM qp JOIN c ON qp.query_id = c.vec_id
                              JOIN icents ON qp.ivf_cell = icents.icent),
              qsub AS (SELECT query_id, ivf_cell, u.sub AS sub, u.sv AS sv FROM (
                         SELECT query_id, ivf_cell, unnest(list_transform(range(0, $PqM),
                           j -> {'sub': CAST(j AS INT),
                                 'sv': qrv[CAST(j * $subDim + 1 AS INT):CAST(j * $subDim + $subDim AS INT)]})) AS u
                         FROM qres)),
              tbl AS (SELECT q.query_id, q.ivf_cell, q.sub, cb.cent_id AS cell,
                             list_dot_product(q.sv, q.sv)
                               - 2.0 * list_dot_product(q.sv, cb.cv)
                               + list_dot_product(cb.cv, cb.cv) AS part
                      FROM qsub q JOIN rcb cb USING (sub)),
              ad AS (SELECT t.query_id, k.vec_id, list(t.part ORDER BY t.sub) AS plist
                     FROM codes k
                     JOIN ica ON k.vec_id = ica.vec_id
                     JOIN tbl t ON ica.ivf_cell = t.ivf_cell
                       AND k.sub = t.sub AND k.cell = t.cell
                     WHERE k.vec_id != t.query_id
                     GROUP BY 1, 2),
              ads AS (SELECT query_id, vec_id,
                             round(list_dot_product(plist,
                               list_transform(plist, x -> 1.0)), 6) AS adist
                      FROM ad)
          SELECT query_id, vec_id, adist, CAST(rk AS INT) AS rk FROM (
            SELECT query_id, vec_id, adist,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY adist, vec_id) AS rk
            FROM ads) WHERE rk <= 5"""
    },
    "v10_quantize_error" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              s AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx,
                           (list_max(v) - list_min(v)) / 255.0 AS sc
                    FROM e),
              q AS (SELECT vec_id, v, mn, sc,
                           CASE WHEN mx = mn THEN list_transform(v, x -> -128)
                                ELSE list_transform(v,
                                  x -> CAST(round((x - mn) / sc) AS INT) - 128) END AS qv
                    FROM s),
              d AS (SELECT vec_id, v,
                           list_transform(qv, i -> mn + (i + 128) * sc) AS dq
                    FROM q),
              er AS (SELECT vec_id,
                            list_transform(range(1, len(v) + 1),
                              j -> abs(v[CAST(j AS INT)] - dq[CAST(j AS INT)])) AS err
                     FROM d)
         SELECT vec_id, round(list_max(err), 6) AS max_abs_err,
                round(list_sum(err) / len(err), 6) AS mean_abs_err
         FROM er""",
    "v1_cosine_topk" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
              s AS (SELECT query_id, c.vec_id,
                           list_dot_product(v, qv)
                             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos
                    FROM c, q WHERE c.vec_id != query_id),
              r AS (SELECT query_id, vec_id, cos,
                           CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, vec_id) AS INT) AS rk
                    FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cosine, rk FROM r WHERE rk <= 5""",
    "v2_lsh_histogram" -> {
      val bits = (0 until NPlanes).map(p =>
        s"CASE WHEN list_dot_product(v, ${planeSql(p)}) > 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
          SELECT $bits AS bucket, count(*) AS n_vecs, min(vec_id) AS min_vec
          FROM c GROUP BY bucket"""
    },
    "v4_lsh_topk" -> {
      val bits = (0 until NPlanes).map(p =>
        s"CASE WHEN list_dot_product(v, ${planeSql(p)}) > 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              cb AS (SELECT vec_id, v, $bits AS bucket,
                            sqrt(list_dot_product(v, v)) AS vn FROM c),
              qb AS (SELECT vec_id AS query_id, v AS q, bucket, vn AS qn
                     FROM cb WHERE vec_id < 8),
              s AS (SELECT query_id, cb.vec_id,
                           list_dot_product(cb.v, qb.q) / (cb.vn * qb.qn) AS cos
                    FROM cb JOIN qb USING (bucket) WHERE cb.vec_id != query_id),
              r AS (SELECT query_id, vec_id, cos,
                           CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, vec_id) AS INT) AS rk
                    FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cosine, rk FROM r WHERE rk <= 5"""
    },
    "v8_semantic_dedup" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings),
              cents AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                        FROM c WHERE vec_id % 50 = 0),
              ca0 AS (SELECT vec_id, v, vn, cell FROM (
                SELECT c.vec_id, c.v, c.vn, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS rk
                FROM c, cents) WHERE rk = 1),
              ca AS (SELECT vec_id, v, vn, cell FROM (
                SELECT *, count(*) OVER (PARTITION BY cell) AS cn FROM ca0)
                WHERE cn <= 512)
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6) AS cosine
         FROM ca a JOIN ca b ON a.cell = b.cell AND a.vec_id < b.vec_id
         WHERE round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6) >= 0.4""",
    "v21_semantic_contamination" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings),
              cents AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                        FROM c WHERE vec_id >= 20 AND vec_id % 50 = 0),
              ca0 AS (SELECT vec_id, v, vn, cell FROM (
                SELECT c.vec_id, c.v, c.vn, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS rk
                FROM c, cents) WHERE rk = 1),
              tr AS (SELECT * FROM ca0 WHERE vec_id >= 20),
              ev AS (SELECT * FROM ca0 WHERE vec_id < 20),
              s AS (SELECT tr.vec_id AS train_id, ev.vec_id AS eval_id,
                           round(list_dot_product(tr.v, ev.v) / (tr.vn * ev.vn), 6) AS cosine
                    FROM tr JOIN ev USING (cell)
                    WHERE round(list_dot_product(tr.v, ev.v) / (tr.vn * ev.vn), 6) >= 0.3)
         SELECT train_id, eval_id, cosine FROM (
           SELECT train_id, eval_id, cosine,
                  row_number() OVER (PARTITION BY train_id
                    ORDER BY cosine DESC, eval_id) AS rk
           FROM s) WHERE rk = 1""",
    "v19_hard_negatives" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings),
              cents AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                        FROM c WHERE vec_id % 50 = 0),
              ca AS (SELECT vec_id, v, vn, cell FROM (
                SELECT c.vec_id, c.v, c.vn, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS rk
                FROM c, cents) WHERE rk = 1),
              qa AS (SELECT vec_id AS query_id, v AS q, vn AS qn, cell
                     FROM ca WHERE vec_id < 8),
              s AS (SELECT query_id, ca.vec_id,
                           round(list_dot_product(ca.v, qa.q) / (ca.vn * qa.qn), 6) AS cos
                    FROM ca JOIN qa USING (cell) WHERE ca.vec_id != qa.query_id),
              b AS (SELECT * FROM s WHERE cos >= 0.05 AND cos < 0.5),
              r AS (SELECT query_id, vec_id, cos,
                           CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, vec_id) AS INT) AS rk
                    FROM b)
         SELECT query_id, vec_id, cos AS cosine, rk FROM r WHERE rk <= 3""",
    "v20_jl_distortion" -> {
      val projList = (0 until 16).map(j =>
        s"list_dot_product(v, ${planeSql(j)})").mkString("[", ", ", "]")
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v
                     FROM embeddings WHERE vec_id < 48),
               e AS (SELECT vec_id, v,
                            sqrt(list_dot_product(v, v)) AS vn,
                            $projList AS proj
                     FROM c),
               e2 AS (SELECT vec_id, v, vn, proj,
                             sqrt(list_dot_product(proj, proj)) AS pn
                      FROM e)
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6) AS cos_orig,
                 round(list_dot_product(a.proj, b.proj) / (a.pn * b.pn), 6) AS cos_proj,
                 round(abs(round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6)
                   - round(list_dot_product(a.proj, b.proj) / (a.pn * b.pn), 6)), 6) AS abs_err
          FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id"""
    },
    "v18_prototypicality" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings),
              cents AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                        FROM c WHERE vec_id % 50 = 0),
              ca AS (SELECT vec_id, v, vn, cell FROM (
                SELECT c.vec_id, c.v, c.vn, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS rk
                FROM c, cents) WHERE rk = 1),
              sc AS (SELECT ca.vec_id, ca.cell,
                            round(list_dot_product(ca.v, cv) / (ca.vn * cvn) + 0.0, 6) AS proto
                     FROM ca JOIN cents ON ca.cell = cent_id),
              r AS (SELECT vec_id, cell, proto,
                           row_number() OVER (PARTITION BY cell
                             ORDER BY proto DESC, vec_id) AS rn,
                           count(*) OVER (PARTITION BY cell) AS cn
                    FROM sc)
         SELECT vec_id, cell, proto, rn <= floor(0.2 * cn) AS pruned FROM r""",
    "v17_cell_occupancy" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings),
              cents AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                        FROM c WHERE vec_id % 50 = 0),
              ca AS (SELECT vec_id, cell FROM (
                SELECT c.vec_id, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS rk
                FROM c, cents) WHERE rk = 1)
         SELECT cell, count(*) AS n_vectors,
                count(*) > 512 AS over_cap
         FROM ca GROUP BY cell""",
    "v16_incremental_semantic" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings),
              cents AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                        FROM c WHERE vec_id >= 40 AND vec_id % 50 = 0),
              ca0 AS (SELECT vec_id, v, vn, cell FROM (
                SELECT c.vec_id, c.v, c.vn, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS rk
                FROM c, cents) WHERE rk = 1),
              nw AS (SELECT * FROM (
                SELECT *, count(*) OVER (PARTITION BY cell) AS cn
                FROM ca0 WHERE vec_id < 40) WHERE cn <= 512),
              old AS (SELECT * FROM (
                SELECT *, count(*) OVER (PARTITION BY cell) AS cn
                FROM ca0 WHERE vec_id >= 40) WHERE cn <= 512),
              nn AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                            round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6) AS cosine
                     FROM nw a JOIN nw b ON a.cell = b.cell AND a.vec_id < b.vec_id),
              no AS (SELECT least(a.vec_id, b.vec_id) AS vec_a,
                            greatest(a.vec_id, b.vec_id) AS vec_b,
                            round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6) AS cosine
                     FROM nw a JOIN old b ON a.cell = b.cell AND a.vec_id != b.vec_id)
         SELECT DISTINCT vec_a, vec_b, cosine
         FROM (SELECT * FROM nn UNION ALL SELECT * FROM no)
         WHERE cosine >= 0.4""",
    "v5_ivf_topk" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings),
              cents AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                        FROM c WHERE vec_id % 50 = 0),
              ca AS (SELECT vec_id, v, vn, cell FROM (
                SELECT c.vec_id, c.v, c.vn, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS rk
                FROM c, cents) WHERE rk = 1),
              qa AS (SELECT vec_id AS query_id, v AS q, vn AS qn, cell
                     FROM ca WHERE vec_id < 8),
              s AS (SELECT query_id, ca.vec_id,
                           list_dot_product(ca.v, qa.q) / (ca.vn * qa.qn) AS cos
                    FROM ca JOIN qa USING (cell) WHERE ca.vec_id != qa.query_id),
              r AS (SELECT query_id, vec_id, cos,
                           CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, vec_id) AS INT) AS rk
                    FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cosine, rk FROM r WHERE rk <= 5""",
    "v7_lsh_recall" -> {
      val bits = (0 until NPlanes).map(p =>
        s"CASE WHEN list_dot_product(v, ${planeSql(p)}) > 0 THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                            sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                     FROM embeddings),
               q AS (SELECT vec_id AS query_id, v AS qv, vn AS qn FROM c WHERE vec_id < 8),
               bs AS (SELECT query_id, c.vec_id,
                             list_dot_product(v, qv) / (vn * qn) AS cos
                      FROM c, q WHERE c.vec_id != query_id),
               br AS (SELECT query_id, vec_id FROM (
                        SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, vec_id) AS rk FROM bs) WHERE rk <= 5),
               cb AS (SELECT vec_id, v, vn, $bits AS bucket FROM c),
               qb AS (SELECT vec_id AS query_id, v AS q2, vn AS qn2, bucket
                      FROM cb WHERE vec_id < 8),
               ls AS (SELECT query_id, cb.vec_id,
                             list_dot_product(cb.v, q2) / (cb.vn * qn2) AS cos
                      FROM cb JOIN qb USING (bucket) WHERE cb.vec_id != query_id),
               lr AS (SELECT query_id, vec_id FROM (
                        SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, vec_id) AS rk FROM ls) WHERE rk <= 5)
          SELECT br.query_id AS query_id,
                 round(CAST(count(lr.vec_id) AS DOUBLE) / count(*), 6) AS recall
          FROM br LEFT JOIN lr ON br.query_id = lr.query_id AND br.vec_id = lr.vec_id
          GROUP BY br.query_id"""
    },
    "v6_ivf_nprobe" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings),
              cents AS (SELECT vec_id AS cent_id, v AS cv, vn AS cvn
                        FROM c WHERE vec_id % 50 = 0),
              ca AS (SELECT vec_id, v, vn, cell FROM (
                SELECT c.vec_id, c.v, c.vn, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS rk
                FROM c, cents) WHERE rk = 1),
              qa AS (SELECT query_id, q, qn, cell FROM (
                SELECT c.vec_id AS query_id, c.v AS q, c.vn AS qn, cent_id AS cell,
                       row_number() OVER (PARTITION BY c.vec_id
                         ORDER BY list_dot_product(c.v, cv) / (c.vn * cvn) + 0.0 DESC,
                                  cent_id) AS pr
                FROM c, cents WHERE c.vec_id < 8) WHERE pr <= 2),
              s AS (SELECT query_id, ca.vec_id,
                           list_dot_product(ca.v, qa.q) / (ca.vn * qa.qn) AS cos
                    FROM ca JOIN qa USING (cell) WHERE ca.vec_id != qa.query_id),
              r AS (SELECT query_id, vec_id, cos,
                           CAST(row_number() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, vec_id) AS INT) AS rk
                    FROM s)
         SELECT query_id, vec_id, round(cos, 6) AS cosine, rk FROM r WHERE rk <= 5""",
    "v3_cosine_neardup" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS vn
                    FROM embeddings WHERE vec_id < 128)
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6) AS cosine
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         WHERE list_dot_product(a.v, b.v) / (a.vn * b.vn) > 0.5""")
}
