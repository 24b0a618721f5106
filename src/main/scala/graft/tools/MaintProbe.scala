package graft.tools

import graft.ann.Vectors
import graft.core.Bucketing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe for the three maintenance-path scale claims (SURVEY
  * §6.3): the AQE-vs-salting skew A/B, IVF-PQ incremental-append cost
  * tracking the shard, and bucketed-table compaction recovering per-query
  * read cost after many appends. Separated from [[ScaleProbe]] so the
  * amplification factor can be sized to each question (the skew A/B needs
  * far more rows than the dedup sections to rise above noise).
  *
  * Usage: runMain graft.tools.MaintProbe [sfDir] [sections]
  * where sections is a comma list of {x8,v15,refresh,feed,compact,decont,stream,pack,clusters,linescrub,budget,budgetdiag,dsir,bpe,lm,verify,exactdedup,langid,langid176,stringid,warc,warcbig,docext,chunk}
  * (default: {x8,v15,compact,decont} — the original three claims; every
  * other section must be named explicitly, so a scale-evidence run names
  * the section it is collecting for).
  */
object MaintProbe {

  private def time[A](name: String)(f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $name: $s%.1f s")
    (r, s)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections = args.drop(1).headOption
      .map(_.split(",").toSet).getOrElse(Set("x8", "v15", "compact", "decont"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def amplify(df: DataFrame, idCol: String, copies: Int,
                shift: Long): DataFrame = {
      val k = spark.range(0, copies).toDF("__copy")
      df.crossJoin(broadcast(k))
        .withColumn(idCol, col(idCol) + col("__copy") * shift)
        .drop("__copy")
        // a narrow source (one parquet file) otherwise leaves the whole
        // amplified map side on 1-2 input tasks (SURVEY §6.3 lesson)
        .repartition(cpus.toInt)
    }

    // ---- x8: AQE skew-join vs deterministic salting, 50x orders ----
    // 7.5M fact rows, half pinned to ONE hot key; dim forced non-broadcast.
    if (sections("x8")) locally {
      val orders = amplify(spark.read.parquet(s"$sfDir/orders.parquet"),
        "o_orderkey", 50, 100000000L)
        .select("o_orderkey", "o_custkey").localCheckpoint()
      println(s"[probe] x8 fact rows: ${orders.count()}")
      val fact = orders.withColumn("k",
        when(col("o_orderkey") % 2 === 0, lit(-1L)).otherwise(col("o_custkey")))
      val dim = orders.select(col("o_custkey").as("k")).distinct()
        .union(spark.range(-1, 0).select(col("id").as("k")))
        .withColumn("attr", md5(col("k").cast("string")))
        .localCheckpoint()
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevSkew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        def run() = fact.join(dim, "k").agg(count(lit(1))).collect()
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        time("x8/50x plain SMJ, AQE skew-join OFF (straggler reducer)") { run() }
        time("x8/50x plain SMJ, AQE skew-join OFF, run 2") { run() }
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        time("x8/50x plain SMJ, AQE skew-join ON (runtime split)") { run() }
        time("x8/50x plain SMJ, AQE skew-join ON, run 2") { run() }
        time("x8/50x saltedJoin (32 buckets, deterministic salt)") {
          graft.ops.Skew.saltedJoin(fact, dim, "k", col("o_orderkey"), 32)
            .agg(count(lit(1))).collect()
        }
        time("x8/50x saltedJoin, run 2") {
          graft.ops.Skew.saltedJoin(fact, dim, "k", col("o_orderkey"), 32)
            .agg(count(lit(1))).collect()
        }
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      }
      spark.catalog.clearCache()
    }

    // ---- v15: IVF-PQ append cost vs index size (must track the SHARD) ----
    if (sections("v15")) locally {
      val emb = amplify(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", 100, 1000000L).localCheckpoint()
      println(s"[probe] v15 embeddings rows: ${emb.count()}")
      val shard = emb.filter(col("vec_id") % 100 === 7)   // 1%
      val base = emb.filter(col("vec_id") % 100 =!= 7)
      val m = 8
      val books = Vectors.pqCodebooksStep(base, "vec_id", "embedding", m, 200)
        .localCheckpoint()
      val cents = Vectors.stepCentroids(base, "vec_id", "embedding", 50)
        .localCheckpoint()
      val (_, buildS) = time("v15/100x base index build + bucketed write (99%)") {
        Vectors.writeIvfPqIndex(
          Vectors.ivfPqIndex(base, "vec_id", "embedding", cents, books, m),
          "maint_ivfpq_idx")
      }
      val (baseMse, _) = time("v15/100x drift baseline meanPqMse (one-time)") {
        Vectors.meanPqMse(base, "vec_id", "embedding", books, m)
      }
      val (_, appendS) = time("v15/100x append 1% shard (drift check + encode + insert)") {
        Vectors.appendToIvfPqIndex("maint_ivfpq_idx", shard,
          "vec_id", "embedding", cents, books, m, baselineMse = baseMse)
      }
      println(f"[probe] v15/100x append/rebuild cost ratio: ${appendS / buildS}%.3f " +
        "(shard is 1% of the corpus; a ratio near 0.01-0.1 means ingest " +
        "tracks the shard, not the index)")
      spark.catalog.clearCache()
    }

    // ---- refresh: quantizer refresh vs fresh rebuild (epoch swap ≈ free) --
    // The remediation path's cost claim: refreshIvfPq = retrain + one
    // corpus re-encode + bucketed write + DROP/RENAME — the same bill as
    // a fresh rebuild with the SAME trainers, plus only the (metadata)
    // epoch swap. A ratio near 1 means the crash-safe swap discipline
    // costs nothing over the naive drop-and-rebuild it replaces.
    if (sections("refresh")) locally {
      val emb = amplify(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", 20, 1000000L).localCheckpoint()
      println(s"[probe] refresh embeddings rows: ${emb.count()}")
      val m = 8
      val (_, rebuildS) = time("refresh/rebuild: train + encode + fresh bucketed write") {
        val cents = Vectors.kmeansCentroids(emb, "vec_id", "embedding",
          k = 50, iters = 2, sampleFrac = 0.1)
        val books = Vectors.pqTrain(emb, "vec_id", "embedding", m,
          k = 64, iters = 2, sampleFrac = 0.1)
        Vectors.writeIvfPqIndex(
          Vectors.ivfPqIndex(emb, "vec_id", "embedding", cents, books, m),
          "maint_refresh_idx")
      }
      val (_, refreshS) = time("refresh/epoch-swap: retrainIvfPq (same trainers + swap + new baseline)") {
        Vectors.retrainIvfPq(spark, "maint_refresh_idx", emb,
          "vec_id", "embedding", k = 50, m = m, codes = 64, iters = 2,
          sampleFrac = 0.1)
      }
      println(f"[probe] refresh/rebuild cost ratio: ${refreshS / rebuildS}%.3f " +
        "(retrainIvfPq also computes the new drift baseline — a ratio " +
        "near 1 means the crash-safe epoch swap is free next to the encode)")
      spark.catalog.clearCache()
    }

    // ---- bucketed compaction: read cost after 10 appends vs compacted ----
    if (sections("compact")) locally {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val m = 8
      val books = Vectors.pqCodebooksStep(emb, "vec_id", "embedding", m, 200)
        .localCheckpoint()
      val cents = Vectors.stepCentroids(emb, "vec_id", "embedding", 50)
        .localCheckpoint()
      Vectors.writeIvfPqIndex(
        Vectors.ivfPqIndex(emb, "vec_id", "embedding", cents, books, m),
        "maint_compact_idx")
      // 10 daily shards (ids shifted so they are new)
      (1 to 10).foreach { day =>
        val shard = emb.filter(col("vec_id") % 10 === 0)
          .withColumn("vec_id", col("vec_id") + day * 10000000L)
        Vectors.appendToIvfPqIndex("maint_compact_idx", shard,
          "vec_id", "embedding", cents, books, m)
      }
      println(s"[probe] files after 10 appends: " +
        Bucketing.dataFiles(spark, "maint_compact_idx").size)
      val q = emb.filter(col("vec_id") < 8)
      def query() =
        Vectors.ivfPqTopKFromIndex(Vectors.readIvfPqIndex(spark, "maint_compact_idx"),
          q, "vec_id", "embedding", cents, books, m, 5, nprobe = 2).count()
      time("compact/query over 11 file sets (warmup)") { query() }
      val (_, beforeS) = time("compact/query over 11 file sets") { query() }
      val (_, compactS) = time("compact/compactBucketed (shuffle-free rewrite)") {
        Bucketing.compactBucketed(spark, "maint_compact_idx")
      }
      println(s"[probe] files after compaction: " +
        Bucketing.dataFiles(spark, "maint_compact_idx").size)
      time("compact/query over 1 file set (warmup)") { query() }
      val (_, afterS) = time("compact/query over 1 file set") { query() }
      println(f"[probe] compaction: query ${beforeS}%.2f s -> ${afterS}%.2f s, " +
        f"rewrite cost ${compactS}%.2f s amortized over every later query")
    }
    // ---- decontamination: cost linear in the train corpus ----
    // The eval side is a benchmark (fixed size); the train side grows.
    // Timing 1x vs 10x train reads the scaling exponent directly.
    if (sections("decont")) locally {
      import graft.dedup.Dedup
      val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
        .localCheckpoint()
      val docs10 = amplify(docs1, "doc_id", 10, 1000000L).localCheckpoint()
      val evalSide = docs1.filter(col("doc_id") < 50)
      def run(df: DataFrame): Long =
        Dedup.contaminatedIds(df.filter(col("doc_id") >= 50), col("doc_id"),
          col("text"), evalSide, col("text"), 5).count()
      time("decont contaminatedIds warmup") { run(docs1) }
      time("decont 1x train corpus") { run(docs1) }
      time("decont 10x train corpus") { run(docs10) }
      val docs100 = amplify(docs1, "doc_id", 100, 1000000L).localCheckpoint()
      println(s"[probe] decont 100x rows: ${docs100.count()}")
      time("decont 100x train corpus") { run(docs100) }
    }
    // ---- feed: curatedFeed end-to-end wall vs corpus size ----
    // The mixture-applied packed feed composes the sampler's range
    // shuffle, the broadcast plan join, and the shard write — all
    // individually linear; this times the COMPOSITION at 10× apart so
    // the end-to-end exponent reads off the ratio (a super-linear stage
    // hiding in the composition would show here even though every piece
    // probes linear alone).
    if (sections("feed")) locally {
      import graft.pipelines.Pipelines
      def mkDocs(n: Long): DataFrame = spark.range(n)
        .select(col("id").as("doc_id"),
          concat(lit("src"), (col("id") % 8).cast("string")).as("source"),
          (col("id") % 37 + 38).as("n_tok"))
        .repartition(cpus.toInt).localCheckpoint()
      val weights = spark.range(8)
        .select(concat(lit("src"), col("id").cast("string")).as("source"),
          (col("id") + 1).cast("int").as("w"))
      val walls = Seq(1000000L, 10000000L).map { n =>
        val docs = mkDocs(n)
        val out = java.nio.file.Files.createTempDirectory(s"feedprobe$n").toString
        val (_, s) = time(s"feed/curatedFeed end-to-end, $n docs") {
          Pipelines.curatedFeed(docs, "doc_id", "source", weights,
            col("n_tok"), budget = 4096L, windowsPerShard = 1024L,
            outDir = out).count()
        }
        s
      }
      println(f"[probe] feed 10x-data wall ratio: ${walls(1) / walls(0)}%.2f " +
        "(near 10 = linear composition; the plan/offsets stay broadcast-sized)")
    }

    // ---- pack: the one-group pack-layout cliff and its distributed fix ----
    // packedWindows' per-group window cumsum serializes each group
    // through ONE task; a single global pack order (the common trainer
    // layout) is the worst case. Timing both forms on a one-group corpus
    // at 1M and 10M docs reads the cliff and the fix directly.
    if (sections("pack")) locally {
      import graft.ops.Planners
      def mkDocs(n: Long): DataFrame = spark.range(n)
        .select(col("id"), lit("all").as("g"),
          (col("id") % 37 + 38).as("n_tok"))
        .repartition(cpus.toInt).localCheckpoint()
      def run(f: => DataFrame): Long =
        f.agg(sum(col("len"))).collect()(0).getLong(0)
      for (n <- Seq(1000000L, 10000000L, 40000000L)) {
        val docs = mkDocs(n)
        time(s"pack/window form, 1 group, $n docs") {
          run(Planners.packedWindows(docs, "g", "id", "n_tok", 4096L))
        }
        time(s"pack/distributed form, 1 group, $n docs") {
          run(Planners.packedWindowsDistributed(docs, "g", "id", "n_tok", 4096L))
        }
      }
    }
    // ---- linescrub: CCNet line scrub — batch linearity + shard-cost
    // ingest. Claims: the batch scrub is ~2 corpus-sized shuffles of
    // 8 B hash keys (linear 1M→10M); the shard scrub's cost tracks the
    // SHARD (the persisted freq table aggregates and joins on its own
    // bucket key — a 10× bigger table must not 10× the ingest).
    if (sections("linescrub")) locally {
      import graft.dedup.Dedup
      def mkDocs(n: Long, shift: Long = 0L): DataFrame = spark.range(n)
        .select((col("id") + shift).as("doc_id"),
          concat(lit("accept all cookies to continue\n"),
            lit("body "), (col("id") % 50000).cast("string"),
            lit(" text\n"),
            lit("unique line "), (col("id") + shift).cast("string"))
            .as("text"))
        .repartition(cpus.toInt).localCheckpoint()
      def lines = split(col("text"), "\n")
      for (n <- Seq(1000000L, 10000000L)) {
        val docs = mkDocs(n)
        time(s"linescrub/batch hashed scrub, $n docs x 3 lines") {
          Dedup.scrubFrequentSegments(docs, col("doc_id"), lines,
              maxDf = 4, hashed = true)
            .agg(sum(col("n_dropped"))).collect()
        }
      }
      for (n <- Seq(1000000L, 10000000L)) {
        spark.sql("DROP TABLE IF EXISTS probe_lf")
        val corpus = mkDocs(n)
        time(s"linescrub/freq-table build, $n docs (one-time)") {
          Dedup.writeLineFreq(corpus, col("doc_id"), lines, "probe_lf", 64)
        }
        val shard = mkDocs(100000L, shift = 900000000L)
        time(s"linescrub/shard scrub (100k docs) vs $n-doc table") {
          Dedup.scrubShardSegments(shard, col("doc_id"), lines,
              Dedup.readLineFreq(spark, "probe_lf"), maxDf = 4)
            .agg(sum(col("n_dropped"))).collect()
        }
        spark.sql("DROP TABLE IF EXISTS probe_lf")
      }
    }
    // ---- budget: tokenBudgetSelect on one global order ----
    // Claim: the two-phase cumsum stays linear where a single global
    // window would serialize the corpus through one task (the pack
    // section measures that cliff for the same machinery).
    if (sections("budget")) locally {
      import graft.ops.Planners
      def mkDocs(n: Long): DataFrame = spark.range(n)
        .select(col("id"), (col("id") % 97).as("q"),
          (col("id") % 37 + 38).as("n_tok"))
        .repartition(cpus.toInt).localCheckpoint()
      for (n <- Seq(1000000L, 10000000L, 40000000L)) {
        val docs = mkDocs(n)
        time(s"budget/distributed select, $n docs (keep ~1/3)") {
          Planners.tokenBudgetSelect(docs, "id", "q", "n_tok", n * 19L)
            .agg(count(lit(1))).collect()
        }
        if (n == 40000000L)
          time(s"budget/distributed select, $n docs, 256 partitions") {
            Planners.tokenBudgetSelect(docs, "id", "q", "n_tok", n * 19L,
                partitions = 256)
              .agg(count(lit(1))).collect()
          }
      }
    }
    // ---- dsir: DSIR model fit + scoring at 10× apart — fit is two
    // explode→B-bucket aggregates (map-side combine collapses the gram
    // explosion), scoring is the shuffle-free broadcast-λ fold; both
    // should scale ~linearly in corpus tokens, and the 10× wall ratio is
    // the evidence.
    if (sections("dsir")) locally {
      import graft.ops.Dsir
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      // 100k / 1M / 10M docs — two decades, so the scaling exponent of
      // the corpus-sized scoring pass reads off twice
      for (copies <- Seq(20, 200, 2000)) {
        val docs = amplify(docs0, "doc_id", copies, 10000000L)
          .localCheckpoint()
        val n = docs.count()
        val (model, _) = time(s"dsir/model fit, $n docs (B=4096)") {
          val m = Dsir.importanceModel(docs,
              docs.filter(col("lang") === "en"), col("text"), buckets = 4096)
            .localCheckpoint(false)
          m.count(); m
        }
        time(s"dsir/score + Gumbel top-1k resample, $n docs") {
          Dsir.importanceResample(
            Dsir.importanceWeights(docs, col("doc_id"), col("text"),
              model, 4096),
            col("doc_id"), k = 1000, seed = 1L).count()
        }
        // the xxhash64 fast path (oracle-inexpressible, same model
        // semantics): the delta vs the md5 run above is the per-gram
        // hex-string + base-16-parse cost the 100 TB tier avoids
        val (modelX, _) = time(s"dsir/model fit XXH, $n docs (B=4096)") {
          val m = Dsir.importanceModel(docs,
              docs.filter(col("lang") === "en"), col("text"),
              buckets = 4096, xxh = true)
            .localCheckpoint(false)
          m.count(); m
        }
        time(s"dsir/score + resample XXH, $n docs") {
          Dsir.importanceResample(
            Dsir.importanceWeights(docs, col("doc_id"), col("text"),
              modelX, 4096, xxh = true),
            col("doc_id"), k = 1000, seed = 1L).count()
        }
      }
      spark.catalog.clearCache()
    }
    // ---- bpe: the Sennrich word-frequency claim measured — the corpus
    // pass (wordFreq) must scale with the corpus while the k merge
    // rounds, running on the vocab relation, stay FLAT as the corpus
    // behind them grows (amplified copies share one vocabulary, which is
    // exactly the production shape: vocab ≪ corpus).
    if (sections("bpe")) locally {
      import graft.text.Bpe
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      for (copies <- Seq(20, 200)) {
        val docs = amplify(docs0, "doc_id", copies, 10000000L)
          .localCheckpoint()
        val n = docs.count()
        val (vf, _) = time(s"bpe/wordFreq corpus pass, $n docs") {
          val v = Bpe.wordFreq(docs, col("text")).localCheckpoint(false)
          println(s"[probe] vocab size: ${v.count()}"); v
        }
        time(s"bpe/learnMerges k=8 over the vocab ($n docs behind it)") {
          Bpe.learnMerges(vf, 8)._1.count()
        }
      }
      // realistic merge counts (r13 verdict gap #3): production
      // tokenizers train k=32k merges; each round is vocab-sized, so
      // per-round time must stay FLAT as k grows — t(4×k) ≈ 4×t(k), no
      // superlinear plan/storage creep (the scratch-backed round path
      // above k=64). The testdata vocabulary is 31 words (89 merges to
      // exhaustion — too shallow to probe ANY realistic k), so merge
      // depth comes from a deterministic synthetic vocabulary: 8000
      // distinct tri-syllable words (~40k merges available), Zipf-ish
      // frequencies. Per-round numbers divide by the merges actually
      // LEARNED (the merge-table row count), never by the requested k.
      locally {
        val syll = Seq("ba", "be", "bi", "bo", "bu", "da", "de", "di",
          "do", "du", "ka", "ke", "ki", "ko", "ku", "ma", "me", "mi",
          "mo", "mu")
        val sArr = array(syll.map(lit): _*)
        val vf = spark.range(8000).select(
          concat(
            element_at(sArr, (col("id") / 400).cast("int") + 1),
            element_at(sArr, ((col("id") / 20) % 20).cast("int") + 1),
            element_at(sArr, (col("id") % 20).cast("int") + 1))
            .as("word"),
          (col("id") % 97 + 1).as("freq"))
          .localCheckpoint(false)
        println(s"[probe] bpe deep-merge vocab size: ${vf.count()}")
        val results = Seq(256, 1024).map { kk =>
          val (learned, s) = time(s"bpe/learnMerges k=$kk") {
            Bpe.learnMerges(vf, kk)._1.count()
          }
          println(f"[probe] bpe k=$kk: $learned merges learned, " +
            f"${s / learned * 1000}%.0f ms/round")
          (kk, learned, s)
        }
        val perRound = results.map { case (_, n, s) => s / n }
        println(f"[probe] bpe per-round ratio k=1024/k=256: " +
          f"${perRound(1) / perRound(0)}%.2f (≈1.0 ⇒ flat, linear in k)")
      }
      spark.catalog.clearCache()
    }
    // ---- langid: trained language-ID CAPACITY probe (r14 verdict
    // missing #4): the oracle fixture is k=12 buckets × 5 heads, but
    // production fastText-style models use orders more features. The
    // lockstep trainer's gradient aggregate is langs×(k+1) sum columns
    // in ONE pass — this measures per-pass cost as k grows (20 heads,
    // ~1M docs) to locate the in-engine boundary (the honest-BPE
    // discipline: probe, then document where the export point is).
    if (sections("langid")) locally {
      import graft.text.LangIdClassifier
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      val docs = amplify(docs0, "doc_id", 200, 10000000L)
        .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(20L))))
        .localCheckpoint()
      val n = docs.count()
      val langs = (0 until 20).map(i => s"l$i")
      for (k <- Seq(64, 256, 1024)) {
        val (models, s) = time(s"langid/train k=$k, 20 heads, 2 passes, $n docs") {
          LangIdClassifier.train(docs, col("text"), col("lang"), langs,
            k = k, iters = 2)
        }
        println(f"[probe] langid k=$k: ${s / 2}%.1f s/pass " +
          f"(${langs.size * (k + 1)} gradient columns)")
        // inference capacity: one fused-kernel pass scoring every head
        // (predict auto-switches past 512 score terms)
        time(s"langid/predict k=$k, 20 heads, $n docs") {
          LangIdClassifier.predict(docs, col("text"), models, k = k)
            .agg(count(when(col("predicted") === langs.head, 1))).head()
        }
      }
      spark.catalog.clearCache()
    }
    // ---- langid176: CCNet-deployment head count (r17 verdict #7). The
    // 20-head tiers above measure the gradient kernel's k decade; a real
    // CCNet deployment ships 176 languages, and head count multiplies
    // BOTH the gradient-column width (train) and the score-term fanout
    // (predict — the fused kernel auto-switches past 512 terms). One
    // tier at 176 heads x k=1024 over a smaller amplified corpus (head
    // count, not corpus size, is the variable under test).
    if (sections("langid176")) locally {
      import graft.text.LangIdClassifier
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      val docs = amplify(docs0, "doc_id", 40, 10000000L)
        .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(176L))))
        .localCheckpoint()
      val n = docs.count()
      val langs = (0 until 176).map(i => s"l$i")
      val k = 1024
      val (models, s) = time(s"langid176/train k=$k, 176 heads, 2 passes, $n docs") {
        LangIdClassifier.train(docs, col("text"), col("lang"), langs,
          k = k, iters = 2)
      }
      println(f"[probe] langid176 k=$k: ${s / 2}%.1f s/pass " +
        f"(${langs.size * (k + 1)} gradient columns)")
      time(s"langid176/predict k=$k, 176 heads, $n docs") {
        LangIdClassifier.predict(docs, col("text"), models, k = k)
          .agg(count(when(col("predicted") === langs.head, 1))).head()
      }
      spark.catalog.clearCache()
    }
    // ---- docext: document-extraction throughput (r17 family — the
    // --warc-docs ingest shape). Mixed pdf/docx/epub/rtf blobs built
    // from the documents table (one format per id mod 4), materialized,
    // then ONE magic-dispatched extraction pass (documentText + the
    // epubHtml fallback — exactly the CLI's map). Decade tiers show the
    // per-doc cost is flat: extraction is a map-side pass, so crawl
    // ingest rate = per-core parse speed × cores, like the warc walk.
    if (sections("docext")) locally {
      import graft.multimodal.DocFormats
      import spark.implicits._
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      for (mult <- Seq(20, 200)) {
        val blobs = amplify(docs0, "doc_id", mult, 10000000L)
          .select(col("doc_id"), col("text"))
          .as[(Long, String)].map { case (id, t) =>
            val b = (id % 4) match {
              case 0 => DocFormats.pdfFixture(
                s"Doc $id report body (draft).", flate = true)
              case 1 => DocFormats.docxFixture(t)
              case 2 => DocFormats.epubFixture(t)
              case _ => DocFormats.rtfFixture(t)
            }
            (id, b)
          }.toDF("doc_id", "content").localCheckpoint()
        val n = blobs.count()
        val mb = blobs.agg(sum(length(col("content")))).head().getLong(0) /
          1e6
        val (chars, s) = time(f"docext/extract $n mixed blobs ($mb%.0f MB)") {
          blobs.as[(Long, Array[Byte])].map { case (id, b) =>
            val t = DocFormats.documentText(b)
            (id, (if (t.isEmpty) DocFormats.epubHtml(b) else t).length)
          }.toDF("doc_id", "n").agg(sum("n")).head().getLong(0)
        }
        println(f"[probe] docext x$mult: ${n / s / 1000}%.1f kdocs/s, " +
          f"${mb / s}%.1f MB/s, $chars chars out")
        spark.catalog.clearCache()
      }
    }
    // ---- chunk: within-doc sliding-window prep (x23) at corpus scale.
    // Stateless map + explode — the claim is work ∝ docs + windows with
    // no shuffle; a decade shows the per-window cost flat.
    if (sections("chunk")) locally {
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      for (mult <- Seq(20, 200)) {
        val docs = amplify(docs0, "doc_id", mult, 10000000L)
          .select(col("doc_id"), col("text")).localCheckpoint()
        val n = docs.count()
        val (wins, s) = time(s"chunk/windows w=64 s=32, $n docs") {
          graft.ops.Planners.chunkWindows(docs, col("doc_id"),
              col("text"), window = 64, stride = 32)
            .agg(count(lit(1)), sum(length(col("window_text"))))
            .head().getLong(0)
        }
        println(f"[probe] chunk x$mult: $wins windows, " +
          f"${wins / s / 1000}%.0f kwin/s")
        spark.catalog.clearCache()
      }
    }
    // ---- lm: the KN/CCNet scoring family's scale evidence (round-11
    // verdict gap): the chain materializes the corpus-token-scale bigram
    // instance relation to COLUMNAR scratch, so its cost must scale
    // LINEARLY with the corpus across two decades — the DSIR probe
    // discipline applied to the one family that had none.
    if (sections("lm")) locally {
      import graft.text.TextFunctions
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      for (copies <- Seq(20, 200, 2000)) {
        val docs = amplify(docs0, "doc_id", copies, 10000000L)
          .localCheckpoint()
        val n = docs.count()
        time(s"lm/KN self-trained score, $n docs") {
          TextFunctions.bigramLmScoresKn(docs, col("doc_id"), col("text"))
            .agg(count(lit(1)), sum("n_bigrams")).collect()
        }
        time(s"lm/CCNet terciles (train-on-en + score + rank), $n docs") {
          TextFunctions.ccnetBuckets(
            TextFunctions.bigramLmScoresKnAgainst(docs, col("doc_id"),
              col("text"), docs.filter(col("lang") === "en"), col("text")))
            .groupBy("bucket").agg(count(lit(1))).collect()
        }
        // trigram chain (round-12 verdict: the kn3 instance/type
        // relations are ~1.5-3× the bigram's on the same scratch
        // discipline — no probe, no trust)
        time(s"lm/KN3 self-trained score, $n docs") {
          TextFunctions.trigramLmScoresKn(docs, col("doc_id"), col("text"))
            .agg(count(lit(1)), sum("n_trigrams")).collect()
        }
        time(s"lm/KN3 CCNet terciles (train-on-en + score + rank), $n docs") {
          TextFunctions.ccnetBuckets(
            TextFunctions.trigramLmScoresKnAgainst(docs, col("doc_id"),
              col("text"), docs.filter(col("lang") === "en"), col("text")))
            .groupBy("bucket").agg(count(lit(1))).collect()
        }
        // order-5 Against chain (r14: KenLM parity) — same broadcast
        // shape as the kn3 Against form with two more layers; the pin is
        // that per-decade cost stays linear and tracks kn3's, not the
        // 4×-worse distinct-types restructure the r13 A/B rejected
        time(s"lm/KN5 Against score (train-on-en), $n docs") {
          TextFunctions.scoreKn(docs, col("doc_id"), col("text"),
            TextFunctions.fitKn(docs.filter(col("lang") === "en"),
              col("text"), 5))
            .agg(count(lit(1)), sum("n_ngrams")).collect()
        }
        graft.core.Scratch.cleanupNow()
      }
      spark.catalog.clearCache()
    }
    // ---- verify: LSH candidate proposal + n-gram verification on an
    // ALL-DUP corpus — every doc is half of a 2-copy duplicate group, so
    // candidate docs ≈ THE WHOLE CORPUS: the adversarial case for the
    // verifyCandidates grams relation and the lshCandidatePairs banded
    // relation (both corpus-scale shares, swept to columnar scratch in
    // r13). Synthetic 30-token docs from a 100k-token vocabulary keep
    // groups hash-distinct, so buckets stay size 2 and the pair count
    // tracks the corpus instead of exploding quadratically.
    if (sections("verify")) locally {
      import graft.dedup.Dedup
      for (n <- Seq(100000L, 1000000L, 10000000L)) {
        val docs = spark.range(0, n / 2).toDF("gid")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(29)),
              i => concat(lit("w"),
                pmod(hash(col("gid") * 31 + i), lit(99991))))))
          .crossJoin(broadcast(spark.range(0, 2).toDF("__c")))
          .select((col("gid") * 2 + col("__c")).as("doc_id"), col("text"))
          .repartition(cpus.toInt)
          .localCheckpoint()
        val nn = docs.count()
        time(s"verify/lsh propose + ngram verify, all-dup, $nn docs") {
          val cands = Dedup.lshCandidatePairs(
            Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 8), 4)
          Dedup.verifyCandidates(docs, cands, col("doc_id"), col("text"), 3, 0.3)
            .agg(count(lit(1)), avg("jaccard")).collect()
        }
        graft.core.Scratch.cleanupNow()
      }
      spark.catalog.clearCache()
    }
    // ---- exactdedup: window form (full payload through the fingerprint
    // exchange) vs thin form (winner ids on a (fp,id) projection + semi
    // join) — keep whichever measures better at 10M docs (round-11
    // verdict item 6). Consumers force the payload (sum of text lengths)
    // so both forms pay for delivering survivors, not just deciding them.
    if (sections("exactdedup")) locally {
      import graft.dedup.Dedup
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      for (copies <- Seq(200, 2000)) {
        // amplified copies are exact duplicates by construction — the
        // worst-case duplication profile for both forms
        val docs = amplify(docs0, "doc_id", copies, 10000000L)
          .localCheckpoint()
        val n = docs.count()
        for (run <- 1 to 2) {
          time(s"exactdedup/window form, $n docs, run $run") {
            Dedup.exactDedup(docs, col("doc_id"), col("text"))
              .agg(count(lit(1)), sum(length(col("text")))).collect()
          }
          time(s"exactdedup/thin form, $n docs, run $run") {
            Dedup.exactDedupThin(docs, col("doc_id"), col("text"))
              .agg(count(lit(1)), sum(length(col("text")))).collect()
          }
        }
      }
      spark.catalog.clearCache()
    }
    // ---- stringid: the 128-bit surrogate at crawl-key scale (r16) ----
    // (a) the entry-contract aggregate (NULL + duplicate-id + collision
    //     check, the exact shape dedupCorpusStages runs eagerly) over
    //     2·10⁸ synthetic URL keys — the r15 60-bit surrogate expected
    //     ~0.43 collisions at 10⁹ keys (~35% abort odds); the md5-128
    //     path must sail through, and this times what the check costs a
    //     crawl-scale ingest (one column-pruned aggregate).
    // (b) the string-keyed chain's decades: the full dedupCorpus at
    //     1M / 10M docs keyed by strings vs the same corpus long-keyed —
    //     the surrogate's end-to-end overhead is the delta, and each
    //     keying must hold its decade (≈10× cost 1M→10M).
    if (sections("stringid")) locally {
      import graft.pipelines.Pipelines
      val keys = spark.range(0, 200000000L)
        .select(concat(lit("https://example.com/"),
            pmod(hash(col("id")), lit(1000000)), lit("/page/"),
            col("id")).as("doc_id"))
        .repartition(cpus.toInt)
      val ((tot, nonNull, nid, nsid), _) =
        time("stringid/entry agg (null+dup+collision check), 2e8 string keys") {
          val sidd = keys.withColumn("__sid",
            graft.ops.Determinism.detHash128(col("doc_id")))
          val r = sidd.agg(count(lit(1)), count(col("doc_id")),
            countDistinct(col("doc_id")), countDistinct(col("__sid"))).head()
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        }
      println(s"[probe] stringid/check: total=$tot nonnull=$nonNull " +
        s"distinct_id=$nid distinct_sid=$nsid " +
        s"abort=${nid != nsid || nid != nonNull || tot != nonNull}")
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      for (copies <- Seq(200, 2000)) {
        // unique text per copy: the chain pays real signature/verify/CC
        // work instead of collapsing at exact dedup
        val longDocs = amplify(docs0, "doc_id", copies, 10000000L)
          .withColumn("text", concat(col("text"), lit(" #"), col("doc_id")))
          .localCheckpoint()
        val n = longDocs.count()
        val strDocs = longDocs.withColumn("doc_id",
          concat(lit("doc-"), lpad(col("doc_id").cast("string"), 12, "0")))
          .localCheckpoint()
        time(s"stringid/chain LONG-keyed, $n docs") {
          Pipelines.dedupCorpus(longDocs, col("doc_id"), col("text"),
            minQuality = 0.0).agg(count(lit(1))).collect()
        }
        graft.core.Scratch.cleanupNow()
        time(s"stringid/chain STRING-keyed (128-bit surrogate), $n docs") {
          Pipelines.dedupCorpus(strDocs, col("doc_id"), col("text"),
            minQuality = 0.0).agg(count(lit(1))).collect()
        }
        graft.core.Scratch.cleanupNow()
        longDocs.unpersist(); strDocs.unpersist()
      }
      spark.catalog.clearCache()
    }
    // ---- warc: crawl-ingest throughput (r16) ----
    // The WET/WARC readers are one-task-per-file record walks; ingest
    // throughput should scale with the file count (= task count) and be
    // parse-bound, not framework-bound. 200k synthetic pages (realistic
    // ~2 KB HTML bodies) across 32 shards, read back through the full
    // response path (HTTP envelope + charset sniff + decode) and through
    // extractHtmlText into text — the `dedup --warc` stage-0 cost.
    if (sections("warc")) locally {
      val nPages = 200000L
      val dir = java.nio.file.Files.createTempDirectory("probe_warc").toString
      val body = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
        "sed do eiusmod tempor incididunt ut labore et dolore magna ") * 20
      val pages = spark.range(0, nPages)
        .select(concat(lit("https://probe.example/"), col("id")).as("url"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("ts"),
          concat(lit("<html><head><meta charset=\"utf-8\"/>" +
              "<style>p{x:1}</style></head><body><script>var t=1;</script><p>"),
            lit(body), lit(" page "), col("id"),
            lit("</p></body></html>")).as("html"),
          when(col("id") % 2 === 0, lit("utf-8")).as("cs"))
      val (_, tw) = time(s"warc/write $nPages pages, 32 shards") {
        graft.sources.Wet.writeWarcShards(pages, "url", "ts", "html",
          Some("cs"), dir, 32)
      }
      val mb = new java.io.File(dir).listFiles().map(_.length()).sum / 1e6
      println(f"[probe] warc/corpus size: $mb%.0f MB (${mb / tw}%.0f MB/s write)")
      val (_, tr) = time(s"warc/read+decode $nPages responses") {
        graft.sources.Wet.readWarc(spark, dir).agg(
          count(lit(1)), sum(length(col("html")))).collect()
      }
      println(f"[probe] warc/ingest: ${mb / tr}%.0f MB/s, ${nPages / tr}%.0f pages/s")
      val (_, tx) = time(s"warc/read + extractHtmlText $nPages pages") {
        graft.sources.Wet.readWarc(spark, dir).agg(
          sum(length(graft.text.TextFunctions.extractHtmlText(col("html")))))
          .collect()
      }
      println(f"[probe] warc/ingest+extract: ${mb / tx}%.0f MB/s, ${nPages / tx}%.0f pages/s")
      spark.catalog.clearCache()
    }
    // ---- warcbig: production-shard-size ingest (r17 verdict #1) ----
    // One synthetic WARC file ABOVE the old whole-file ceilings: >2 GiB
    // raw (the binaryFile content / byte-array cap that aborted the old
    // read before this round's record-streaming walk), read back plain
    // AND through the in-flight gunzip path. Success here is the
    // constant-memory proof: the file cannot exist as one array, so the
    // only way the counts come back is one-record-at-a-time walking.
    if (sections("warcbig")) locally {
      val nPages = 2200L
      val dirPlain = java.nio.file.Files.createTempDirectory("probe_warcbig")
        .toString
      val dirGz = java.nio.file.Files.createTempDirectory("probe_warcbig_gz")
        .toString
      // ~1 MiB body per page -> one ~2.3 GiB shard
      val line = "the quick brown fox jumps over the lazy dog 0123456789abc "
      val body = line * (1048576 / line.length)
      val pages = spark.range(0, nPages)
        .select(concat(lit("https://big.example/"), col("id")).as("url"),
          lit("2024-01-01 00:00:00").cast("timestamp").as("ts"),
          concat(lit("<html><body><p>"), lit(body), lit(" page "),
            col("id"), lit("</p></body></html>")).as("html"),
          lit(null).cast("string").as("cs"))
      val (_, tw) = time(s"warcbig/write $nPages x ~1MiB pages, 1 shard") {
        graft.sources.Wet.writeWarcShards(pages, "url", "ts", "html",
          Some("cs"), dirPlain, 1)
      }
      val plainFile = new java.io.File(dirPlain).listFiles()
        .find(_.getName.endsWith(".warc")).get
      val gb = plainFile.length() / 1e9
      println(f"[probe] warcbig/file size: $gb%.2f GB (${gb * 1000 / tw}%.0f MB/s write)")
      require(plainFile.length() > (Int.MaxValue.toLong + 1),
        "warcbig: fixture must exceed the old 2 GiB whole-file ceiling " +
          s"to prove the record-streaming walk, got ${plainFile.length()}")
      val (_, tgz) = time("warcbig/gzip the shard (driver, streamed)") {
        val in = new java.io.BufferedInputStream(
          new java.io.FileInputStream(plainFile), 1 << 16)
        val out = new java.util.zip.GZIPOutputStream(
          new java.io.BufferedOutputStream(new java.io.FileOutputStream(
            new java.io.File(dirGz, "big.warc.gz")), 1 << 16))
        val buf = new Array[Byte](1 << 16)
        var r = in.read(buf)
        while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
        in.close(); out.close()
      }
      println(f"[probe] warcbig/gz size: ${new java.io.File(dirGz, "big.warc.gz").length() / 1e6}%.0f MB (raw $gb%.2f GB)")
      val (cPlain, tr) = time(s"warcbig/read $nPages x 1MiB (plain, >2GiB file)") {
        graft.sources.Wet.readWarc(spark, dirPlain)
          .agg(count(lit(1)), sum(length(col("html")))).collect()(0)
      }
      require(cPlain.getLong(0) == nPages,
        s"warcbig: plain read returned ${cPlain.getLong(0)} of $nPages")
      println(f"[probe] warcbig/plain ingest: ${gb * 1000 / tr}%.0f MB/s")
      val (cGz, trz) = time(s"warcbig/read $nPages x 1MiB (gz, in-flight inflate)") {
        graft.sources.Wet.readWarc(spark, dirGz)
          .agg(count(lit(1)), sum(length(col("html")))).collect()(0)
      }
      require(cGz.getLong(0) == nPages && cGz.getLong(1) == cPlain.getLong(1),
        s"warcbig: gz read mismatch (${cGz.getLong(0)} rows, " +
          s"${cGz.getLong(1)} vs ${cPlain.getLong(1)} chars)")
      println(f"[probe] warcbig/gz ingest: ${gb * 1000 / trz}%.0f MB/s decompressed")
      new java.io.File(dirGz, "big.warc.gz").delete()
      plainFile.delete()
    }
    // ---- budgetdiag: stage-by-stage timing of the two-phase cumsum at
    // the 40M cliff (both pack and budget jump superlinearly 10M→40M;
    // which stage serializes?)
    if (sections("budgetdiag")) locally {
      val w = org.apache.spark.sql.expressions.Window
      val n = 40000000L
      val src = spark.range(n)
        .select(col("id"), (col("id") % 97).as("q"),
          (col("id") % 37 + 38).as("n_tok"))
        .repartition(cpus.toInt)
      val (d0, _) = time("diag/source checkpoint (40M)") {
        val d = src.localCheckpoint(); d.count(); d
      }
      val (r0, _) = time("diag/rangePartition + pid + checkpoint") {
        val r = d0.repartitionByRange(32, col("q").desc, col("id"))
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint()
        r.count(); r
      }
      val (off, _) = time("diag/offsets aggregate") {
        val o = r0.groupBy(col("__pid")).agg(sum(col("n_tok")).as("__psum"))
          .withColumn("__off", coalesce(sum(col("__psum")).over(
            w.orderBy(col("__pid")).rowsBetween(w.unboundedPreceding, -1)),
            lit(0L)))
          .select(col("__pid"), col("__off")).localCheckpoint()
        o.count(); o
      }
      time("diag/join + per-pid window + filter + count") {
        r0.join(broadcast(off), Seq("__pid"))
          .withColumn("cum", col("__off") + sum(col("n_tok")).over(
            w.partitionBy(col("__pid")).orderBy(col("q").desc, col("id"))
              .rowsBetween(w.unboundedPreceding, 0)))
          .filter(col("cum") <= n * 19L)
          .agg(count(lit(1))).collect()
      }
      // A/B the materialization strategies for the shared ranged relation
      val (r1, _) = time("diag/ALT rangePartition + persist(MEMORY_AND_DISK_SER)") {
        val r = d0.repartitionByRange(32, col("q").desc, col("id"))
          .withColumn("__pid", spark_partition_id())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        r.count(); r
      }
      time("diag/ALT pass over persisted-ser (offsets-shaped agg)") {
        r1.groupBy(col("__pid")).agg(sum(col("n_tok"))).collect()
      }
      r1.unpersist()
      val scratch = java.nio.file.Files.createTempDirectory("diagrange").toString
      time("diag/ALT rangePartition + scratch parquet write") {
        d0.repartitionByRange(32, col("q").desc, col("id"))
          .withColumn("__pid", spark_partition_id())
          .write.mode("overwrite").parquet(scratch)
      }
      val rp = spark.read.parquet(scratch)
      time("diag/ALT pass over scratch parquet (offsets-shaped agg)") {
        rp.groupBy(col("__pid")).agg(sum(col("n_tok"))).collect()
      }
    }
    // ---- clusters: incremental fold-in cost vs re-clustering ----
    // Claim: ingestClusterDelta's cost is one no-shuffle read pass over
    // the assignment plus rep-level CC ∝ the shard's pairs — while batch
    // re-clustering pays multi-round shuffles over corpus-scale edges.
    // Fixed shard (20k pairs) against assignments of 1M / 10M docs; the
    // batch baseline re-runs star CC over (old star edges ∪ new pairs).
    if (sections("clusters")) locally {
      import graft.dedup.Dedup
      val nNew = 20000L
      for (n <- Seq(1000000L, 10000000L)) {
        // clusters of 4: assignment doc -> floor(id/4)*4
        val asg = spark.range(n)
          .select(col("id").as("doc_id"), (col("id") - col("id") % 4).as("cluster"))
          .repartition(cpus.toInt).localCheckpoint()
        // shard: half new-doc-to-old-doc links, half old-old bridges
        val pairs = spark.range(nNew).select(
            when(col("id") % 2 === 0, col("id") + n) // new doc id
              .otherwise((col("id") * 7919L) % n).as("doc_a"),
            ((col("id") * 104729L) % n).as("doc_b"))
          .filter(col("doc_a") =!= col("doc_b"))
          .localCheckpoint()
        time(s"clusters/incremental fold-in, $n-doc assignment, $nNew new pairs") {
          Dedup.incrementalClusters(asg, pairs).agg(count(lit(1))).collect()
        }
        time(s"clusters/batch re-cluster, $n docs + $nNew new pairs") {
          Dedup.connectedComponentsStar(
            asg.select(col("doc_id").as("doc_a"), col("cluster").as("doc_b"))
              .filter(col("doc_a") =!= col("doc_b"))
              .union(pairs),
            "doc_a", "doc_b").agg(count(lit(1))).collect()
        }
      }
      spark.catalog.clearCache()
    }
    // ---- stream: streaming day-2 ingest rate tracks the SHARD ----
    // Claim (§6.3): the stream-static candidate joins read only the index
    // buckets a micro-batch touches, so wall scales with shard rows at a
    // FIXED index size. Timed as 1x vs 10x shard against the same
    // persisted index, several micro-batches each (maxFilesPerTrigger),
    // for both members with a persisted index: text bands and semantic
    // cells. Startup/trigger overhead is fixed per run, so the ratio is
    // an upper bound on the per-row exponent.
    if (sections("stream")) locally {
      import graft.dedup.Dedup
      import graft.streaming.Streaming
      import org.apache.spark.sql.streaming.Trigger
      val tmpRoot = java.nio.file.Files.createTempDirectory("streamprobe").toString
      def drain(df: DataFrame, name: String): Double = {
        val q = df.writeStream.outputMode("append")
          .option("checkpointLocation", s"$tmpRoot/ckpt_$name")
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            println(s"[probe] $name batch=$id candidates=${b.count()}")
          }.start()
        val (_, s) = time(s"stream/$name drain") { q.awaitTermination() }
        s
      }
      // text: 50k-doc index (10x corpus), shards of 500 and 5000 docs
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val corpus = amplify(docs, "doc_id", 10, 10000000L).localCheckpoint()
      spark.sql("DROP TABLE IF EXISTS probe_stream_band_idx")
      Dedup.writeBandIndex(Dedup.bandedSignaturesProjected(
        corpus, col("doc_id"), col("text"), 8, 4), "probe_stream_band_idx")
      val bandIdx = Dedup.readBandIndex(spark, "probe_stream_band_idx")
      for (copies <- Seq(1, 10, 100)) {
        val in = s"$tmpRoot/text_in_$copies"
        amplify(docs.limit(500), "doc_id", copies, 1000000L)
          .withColumn("doc_id", col("doc_id") + 900000000L)
          .repartition(8).write.parquet(in)
        val stream = spark.readStream
          .schema(spark.read.parquet(in).schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        drain(Streaming.ingestCandidates(stream, bandIdx, 8, 4),
          s"text_${copies}x (${copies * 500} docs)")
      }
      // semantic: 20k-vector index (10x embeddings), shards of 200 / 2000
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val vcorpus = amplify(emb, "vec_id", 10, 10000000L).localCheckpoint()
      val cents = Vectors.kmeansCentroids(vcorpus, "vec_id", "embedding", 64)
        .localCheckpoint()
      spark.sql("DROP TABLE IF EXISTS probe_stream_sem_idx")
      Vectors.writeSemanticIndex(vcorpus, "vec_id", "embedding", cents,
        "probe_stream_sem_idx")
      val semIdx = Vectors.readSemanticIndex(spark, "probe_stream_sem_idx")
      for (copies <- Seq(1, 10, 100)) {
        val in = s"$tmpRoot/sem_in_$copies"
        amplify(emb.limit(200), "vec_id", copies, 1000000L)
          .withColumn("vec_id", col("vec_id") + 900000000L)
          .repartition(8).write.parquet(in)
        val stream = spark.readStream
          .schema(spark.read.parquet(in).schema)
          .option("maxFilesPerTrigger", 2).parquet(in)
        drain(Streaming.ingestSemanticCandidates(stream, semIdx, cents,
          "vec_id", "embedding", minCosine = 0.9),
          s"sem_${copies}x (${copies * 200} vecs)")
      }
    }
    spark.stop()
  }
}
