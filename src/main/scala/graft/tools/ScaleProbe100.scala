package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× probe of the TWO heaviest compositions — the full LSH dedup chain
  * (minhash → band join → verify → connected components) and the
  * trainingFeed — timed at 10× and 100× in the same session so the
  * scaling exponent is read directly off the ratio (linear = ~10×).
  *
  * Amplification here VARIES the text per copy (" copyN" suffix), unlike
  * [[ScaleProbe]]'s exact copies: an exact-copy corpus grows pair cliques
  * quadratically in the copy count (every doc + its 99 twins), which
  * measures the amplification artifact, not the operator. With varied
  * copies each copy-space replicates the ORIGINAL corpus's near-dup
  * structure, so candidate/verified/edge counts — every stage's true
  * input — scale linearly with the corpus, which is what a 100× bigger
  * real corpus does.
  *
  * Connected components additionally gets a controlled synthetic graph
  * (dense cliques + a long chain, sized by the copy factor) because its
  * cost is driven by the EDGE relation, not the corpus.
  *
  * Usage: runMain graft.tools.ScaleProbe100 [copies=100] [sfDir] [sections]
  * where sections ⊆ chain,cc,feed,feedparts,feedpq,pipeline
  * (comma-separated; default chain,cc,feed).
  * Run with SPARK_DRIVER_MEM=48g+ — the 100× feed sketches a 45M-row
  * manifest through a range partitioner.
  */
object ScaleProbe100 {

  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(100)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val sections = args.drop(2).headOption.map(_.split(",").toSet)
      .getOrElse(Set("chain", "cc", "feed"))
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

    def amplifyVaried(df: DataFrame, idCol: String, textCol: String,
                      n: Int, shift: Long): DataFrame = {
      val k = spark.range(0, n).toDF("__copy")
      df.crossJoin(broadcast(k))
        .withColumn(idCol, col(idCol) + col("__copy") * shift)
        .withColumn(textCol,
          concat(col(textCol), lit(" copy"), col("__copy")))
        .drop("__copy")
    }

    def dedupChain(factor: Int): Unit = {
      val docs = amplifyVaried(spark.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text", factor, 10000000L).localCheckpoint()
      println(s"[probe] ${factor}x docs: ${docs.count()}")
      time(s"${factor}x dedup chain (minhash->band->verify->CC)") {
        val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 8)
        val cands = Dedup.lshCandidatePairs(sigs, 4)
        val verified = Dedup.verifyCandidates(docs, cands,
          col("doc_id"), col("text"), 3, 0.3).localCheckpoint()
        println(s"[probe] ${factor}x verified pairs: ${verified.count()}")
        println(s"[probe] ${factor}x clustered docs: " +
          Dedup.connectedComponents(verified, "doc_a", "doc_b").count())
      }
      spark.catalog.clearCache()
    }
    if (sections("chain")) { dedupChain(copies / 10); dedupChain(copies) }

    // CC on controlled synthetic graphs: edges scale with the factor, so
    // the two timings isolate CC's own scaling in its true input size
    def ccGraph(factor: Int): Unit = {
      val cliqueDocs = 1000L * factor
      // 10-cliques: doc i pairs with the 9 following docs in its block
      val edges = spark.range(0, cliqueDocs)
        .select(col("id").as("doc_a"),
          explode(sequence(lit(1), lit(9))).as("__j"))
        .select(col("doc_a"),
          ((col("doc_a") / 10) * 10 + (col("doc_a") + col("__j")) % 10).as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
        .union(
          // plus one long chain (diameter 10k·factor) for the star variant
          spark.range(0, 10000L * factor)
            .select((col("id") + 100000000L).as("doc_a"),
              (col("id") + 100000001L).as("doc_b")))
        .localCheckpoint()
      println(s"[probe] ${factor}x synthetic edges: ${edges.count()}")
      time(s"${factor}x connectedComponentsStar (cliques + ${10000 * factor}-chain)") {
        Dedup.connectedComponentsStar(edges, "doc_a", "doc_b", maxIter = 60)
          .count()
      }
    }
    if (sections("cc")) { ccGraph(copies / 10); ccGraph(copies) }

    // perceptual near-dup chain over synthetic 63-bit fingerprints with a
    // realistic near-dup structure: 2% of docs are a 1-bit nudge of a base
    // doc (the re-encoded/re-graded copy), everything else pseudo-random —
    // the decode cost is bench-measured per modality (d13/d14/d15); this
    // probe isolates the BAND→VERIFY→CC part that actually grows with the
    // corpus, at 63-bit width (the production grid, not the oracle's 16)
    def fpChain(factor: Int): Unit = {
      val n = 5000L * factor
      val base = spark.range(0, n)
        .select(col("id").as("doc_id"),
          abs(xxhash64(col("id"))).as("fp"))
      val nudged = spark.range(0, n / 50)
        .select((col("id") * 50 + n).as("doc_id"),
          // copy of doc (id*50) with bit (id % 63) flipped
          abs(xxhash64(col("id") * 50))
            // scala shiftleft() wants a literal shift; the SQL function
            // accepts a column
            .bitwiseXOR(call_function("shiftleft", lit(1L),
              (col("id") % 63).cast("int")))
            .as("fp"))
      val fps = base.union(nudged).localCheckpoint()
      println(s"[probe] ${factor}x fingerprints: ${fps.count()}")
      // 3 bands x 21 bits: band width sizes bucket population — a 7-bit
      // band has 128 values, so at 500k docs EVERY bucket would exceed the
      // cap and the probe would measure an empty join; 21-bit bands keep
      // buckets near-singleton while the pigeonhole still guarantees any
      // pair at Hamming <= 2 collides on at least one of the 3 bands
      time(s"${factor}x fp chain (band->verify->CC, 63-bit, 3x21 bands)") {
        val pairs = Dedup.imageNearDupPairs(fps, col("doc_id"), col("fp"),
          bits = 63, bandBits = 21, maxHamming = 2).localCheckpoint()
        println(s"[probe] ${factor}x fp pairs: ${pairs.count()}")
        println(s"[probe] ${factor}x fp clustered docs: " +
          Dedup.connectedComponentsStar(pairs, "doc_a", "doc_b").count())
      }
      spark.catalog.clearCache()
    }
    if (sections("fp")) { fpChain(copies / 10); fpChain(copies) }

    // novelty: the op is ONE gram-keyed exchange — exact gram strings vs
    // the 64-bit hashed form (hashGrams), which moves 8-byte keys instead
    // of ~40-byte trigram strings through that shuffle. Forced with a
    // full-column checksum (a bare count would let Catalyst prune the
    // novelty arithmetic).
    def noveltyProbe(factor: Int): Unit = {
      val docs = amplifyVaried(spark.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text", factor, 10000000L).localCheckpoint()
      println(s"[probe] ${factor}x novelty docs: ${docs.count()}")
      def force(df: DataFrame): Unit =
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
          .agg(bit_xor(col("__h"))).collect()
      time(s"${factor}x noveltyScores EXACT gram shuffle") {
        force(Dedup.noveltyScores(docs, col("doc_id"), col("text"), 3))
      }
      time(s"${factor}x noveltyScores HASHED gram shuffle") {
        force(Dedup.noveltyScores(docs, col("doc_id"), col("text"), 3,
          hashGrams = true))
      }
      spark.catalog.clearCache()
    }
    if (sections("novelty")) { noveltyProbe(copies / 10); noveltyProbe(copies) }

    // semantic index BUILD forms: the r11 sem probe read 1.3 s → 43.1 s
    // for 10× rows on the aggregate form (crossJoin×k + max_by + self-
    // join). The stateless form (centroids folded in as literals — one
    // projection, no join, no shuffle) is the candidate fix; this
    // section measures both on identical data.
    def semBuildProbe(factor: Int): Unit = {
      import graft.ann.Vectors
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val k = spark.range(0, factor).toDF("__copy")
      val vecs = emb.crossJoin(broadcast(k))
        .withColumn("vec_id", col("vec_id") + col("__copy") * 10000000L)
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => x + sin((i + 1).cast("double") * (col("__copy") + 1)) * lit(5.0)))
        .drop("__copy")
        .repartition(32).localCheckpoint()
      println(s"[probe] ${factor}x sembuild vectors: ${vecs.count()}")
      val cents = Vectors.kmeansCentroids(vecs, "vec_id", "embedding", 256,
        iters = 2, sampleFrac = 0.05).localCheckpoint()
      // force EVERY column (a bare count lets Catalyst prune the vector
      // arrays — the dominant cost — out of both forms)
      def force(df: DataFrame): Unit =
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
          .agg(bit_xor(col("__h"))).collect()
      time(s"${factor}x semanticIndex AGGREGATE form (all columns)") {
        force(Vectors.semanticIndex(vecs, "vec_id", "embedding", cents))
      }
      time(s"${factor}x semanticIndex STATELESS form (all columns)") {
        force(Vectors.assignCellsStateless(vecs, "vec_id", "embedding", cents)
          .select("vec_id", "cell", "v", "vn"))
      }
      spark.catalog.clearCache()
    }
    if (sections("sembuild")) { semBuildProbe(copies / 10); semBuildProbe(copies) }

    // tar-shard export: write + read-back wall at 10×/100× corpus size —
    // one hash shuffle + sequential per-shard writes should stay linear;
    // the read is one task per shard walking headers.
    def tarProbe(factor: Int): Unit = {
      import graft.multimodal.TarShards
      val docs = amplifyVaried(spark.read.parquet(s"$sfDir/documents.parquet"),
          "doc_id", "text", factor, 10000000L)
        .select(concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
          col("text").cast("binary").as("content"))
        .localCheckpoint()
      val n = docs.count()
      println(s"[probe] ${factor}x tar entries: $n")
      val dir = java.nio.file.Files.createTempDirectory(s"tarprobe$factor").toString
      time(s"${factor}x writeTarShards (32 shards)") {
        TarShards.writeTarShards(docs, "name", "content", dir, 32)
      }
      time(s"${factor}x readTarShards (full checksum)") {
        val back = TarShards.readTarShards(spark, dir)
        val cnt = back.select(xxhash64(col("name"), col("content")).as("__h"))
          .agg(bit_xor(col("__h")), count(lit(1))).head().getLong(1)
        println(s"[probe] ${factor}x tar read-back entries: $cnt")
        require(cnt == n, s"tar round-trip lost rows: $cnt != $n")
      }
      spark.catalog.clearCache()
    }
    if (sections("tar")) { tarProbe(copies / 10); tarProbe(copies) }

    // semantic dedup: one-time index build vs the day-2 incremental form.
    // Copies are rotated by a copy-keyed pseudo-random offset (±5 per
    // dim, original values ~N(0,1)) so cross-copy cosines stay low and
    // the near-dup structure is the original corpus's per copy — the
    // varied-copy discipline in embedding space.
    def semChain(factor: Int): Unit = {
      import graft.ann.Vectors
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val k = spark.range(0, factor).toDF("__copy")
      val vecs = emb.crossJoin(broadcast(k))
        .withColumn("vec_id", col("vec_id") + col("__copy") * 10000000L)
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => x + sin((i + 1).cast("double") * (col("__copy") + 1)) * lit(5.0)))
        .drop("__copy")
        .repartition(32).localCheckpoint()
      println(s"[probe] ${factor}x sem vectors: ${vecs.count()}")
      // k-means quantizer, corpus-independent size (k×dim on the driver)
      val cents = time(s"${factor}x sem kmeans (k=256, 5% sample)") {
        Vectors.kmeansCentroids(vecs, "vec_id", "embedding", 256,
          iters = 2, sampleFrac = 0.05).localCheckpoint()
      }
      val shard = vecs.filter(col("vec_id") % 97 === 0).localCheckpoint()
      val index = vecs.filter(col("vec_id") % 97 =!= 0)
      val idx = time(s"${factor}x sem index build (one-time)") {
        val i = Vectors.semanticIndex(index, "vec_id", "embedding", cents)
          .localCheckpoint()
        println(s"[probe] ${factor}x sem index rows: ${i.count()}")
        i
      }
      time(s"${factor}x sem INCREMENTAL (1% shard vs index)") {
        println(s"[probe] ${factor}x sem incr pairs: " +
          Vectors.incrementalSemanticPairs(shard, "vec_id", "embedding",
            cents, idx, minCosine = 0.95).count())
      }
      time(s"${factor}x sem BATCH (full corpus, the rebuild alternative)") {
        println(s"[probe] ${factor}x sem batch pairs: " +
          Vectors.semanticNearDupPairsWith(vecs, "vec_id", "embedding",
            cents, minCosine = 0.95).count())
      }
      spark.catalog.clearCache()
    }
    if (sections("sem")) { semChain(copies / 10); semChain(copies) }

    def feed(factor: Int, shufflePartitions: Option[Int] = None): Unit = {
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      shufflePartitions.foreach(p =>
        spark.conf.set("spark.sql.shuffle.partitions", p.toString))
      try feedBody(factor, shufflePartitions)
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    def feedBody(factor: Int, parts: Option[Int]): Unit = {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val k = spark.range(0, factor).toDF("__copy")
      // no localCheckpoint: pinning 15M full-width order rows on heap is
      // what OOM'd the first 100× run — the amplification is a cheap
      // deterministic projection, recomputing beats materializing
      // repartition AFTER amplification: the crossJoin inherits the source
      // file's input partitioning (1-2 tasks for a single parquet file),
      // which single-threads the entire 45M-row map side at 100× — that
      // artifact, not the feed, produced the original 668.7 s "cliff"
      // (vs 359.3 s linear from a materialized parquet manifest, and
      // shuffle-partition count was measured irrelevant at 634.6 s
      // because the bottleneck precedes any exchange)
      val amped = orders.crossJoin(broadcast(k))
        .withColumn("o_orderkey",
          col("o_orderkey") + col("__copy") * 100000000L)
        .drop("__copy")
        .repartition(cpus.toInt * 4)
      println(s"[probe] ${factor}x orders: ${amped.count()}")
      val diff = when(col("o_orderpriority").startsWith("1-"), "hard")
        .when(col("o_orderpriority").startsWith("2-"), "medium")
        .otherwise("easy")
      val manifest = amped
        .select(col("o_orderkey"), diff.as("diff"))
        .withColumn("suffix",
          explode(array(lit("person"), lit("cloth_a"), lit("vton"))))
        .select(
          concat(lit("s3://b/"), col("diff"), lit("/stem"), col("o_orderkey"),
            lit("_"), col("suffix"), lit(".jpg")).as("key"),
          concat(lit("s3://b/"), col("diff"), lit("/")).as("prefix"))
      val label = parts.map(p => s" (shuffle.partitions=$p)").getOrElse("")
      time(s"${factor}x trainingFeed end-to-end$label") {
        println(s"[probe] ${factor}x feed rows: " +
          graft.pipelines.Pipelines.trainingFeed(manifest,
            Map("easy" -> 0.25, "medium" -> 0.25, "hard" -> 0.5)).count())
      }
      spark.catalog.clearCache()
    }
    if (sections("feed")) { feed(copies / 10); feed(copies) }
    // the partition-sizing A/B: same 100× feed with shuffle partitions
    // scaled to the data (what any real cluster deployment does) — if the
    // cliff is spill from oversized 45M/32 sort partitions, this recovers
    // linearity with zero code change
    if (sections("feedparts")) {
      feed(copies, Some(cpus.toInt * copies / 10))
    }
    // harness-vs-operator A/B: materialize the amplified manifest to
    // parquet ONCE, then time trainingFeed reading it back — the in-memory
    // probe recomputes the crossJoin-amplified manifest on every scan AND
    // holds two localCheckpoint materializations derived from it, so a
    // superlinear in-memory number may be probe pressure, not the operator.
    // A real 100 TB manifest is parquet on disk; this is the honest shape.
    def feedFromParquet(factor: Int): Unit = {
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val k = spark.range(0, factor).toDF("__copy")
      val diff = when(col("o_orderpriority").startsWith("1-"), "hard")
        .when(col("o_orderpriority").startsWith("2-"), "medium")
        .otherwise("easy")
      val path = s"/tmp/probe_manifest_${factor}x.parquet"
      time(s"${factor}x manifest write to parquet (one-time amplification)") {
        orders.crossJoin(broadcast(k))
          .withColumn("o_orderkey",
            col("o_orderkey") + col("__copy") * 100000000L)
          .select(col("o_orderkey"), diff.as("diff"))
          .withColumn("suffix",
            explode(array(lit("person"), lit("cloth_a"), lit("vton"))))
          .select(
            concat(lit("s3://b/"), col("diff"), lit("/stem"), col("o_orderkey"),
              lit("_"), col("suffix"), lit(".jpg")).as("key"),
            concat(lit("s3://b/"), col("diff"), lit("/")).as("prefix"))
          .write.mode("overwrite").parquet(path)
      }
      val manifest = spark.read.parquet(path)
      time(s"${factor}x trainingFeed from parquet manifest") {
        println(s"[probe] ${factor}x feed rows: " +
          graft.pipelines.Pipelines.trainingFeed(manifest,
            Map("easy" -> 0.25, "medium" -> 0.25, "hard" -> 0.5)).count())
      }
      spark.catalog.clearCache()
    }
    if (sections("feedpq")) { feedFromParquet(copies / 10); feedFromParquet(copies) }

    // FULL dedupCorpus with every opt-in stage on — pre-clean, domain cap,
    // decontamination, containment, substring scrub — timed per stage via
    // the dedupCorpusStages funnel (count each stage relation in order:
    // the exact-dedup localCheckpoint materializes on its own count, so
    // later counts read from it and each marginal time is that stage's
    // own cost; the per-stage walls are what a production curation run
    // audits, and the 10×→100× ratio per stage exposes any super-linear
    // stage that the individually-probed compositions could hide behind
    // checkpoint boundaries).
    def fullPipeline(factor: Int): Unit = {
      val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      val docs = amplifyVaried(raw, "doc_id", "text", factor, 10000000L)
        .localCheckpoint()
      println(s"[probe] ${factor}x pipeline docs: ${docs.count()}")
      // the eval split stays FIXED (a benchmark doesn't grow with the
      // corpus — the decontamination boundedness contract)
      val evalDocs = raw.filter(col("doc_id") < 50)
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val stages = graft.pipelines.Pipelines.dedupCorpusStages(
        docs, col("doc_id"), col("text"),
        preClean = true, maxPerSource = (docs.count() / 4L).toInt.max(1),
        evalDocs = Some(evalDocs), minContainment = Some(0.9),
        substrN = Some(20))
      // dedupCorpusStages construction is NOT pure planning: the pair
      // broadcast guard counts the candidate relation (running the
      // minhash → band → verify chain) and the CC round loop iterates
      // eagerly — report that eager core as its own line instead of
      // letting it masquerade as the first stage's count
      println(f"[probe] ${factor}x eager core (pair gen + verify + CC): " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      var prev = System.nanoTime()
      stages.foreach { case (name, df) =>
        val c = df.count()
        val now = System.nanoTime()
        println(f"[probe] ${factor}x stage $name%-24s ${c}%9d rows  " +
          f"${(now - prev) / 1e9}%6.1f s")
        prev = now
      }
      println(f"[probe] ${factor}x full dedupCorpus (all stages): " +
        f"${(prev - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
    }
    if (sections("pipeline")) { fullPipeline(copies / 10); fullPipeline(copies) }

    spark.stop()
  }
}
