package graft.tools

import graft.dedup.Dedup
import graft.ops.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe: replicates the sf0.1 tables ~10× (ids shifted so
  * keys stay unique; text/content left identical, which is the WORST case
  * for dedup — every doc gains 9 exact copies) and times the
  * scale-sensitive operators. Not part of the correctness gate; used to
  * find scale cliffs the 0.1-SF bench can't see.
  *
  * Usage: runMain graft.tools.ScaleProbe [copies] [sfDir]
  */
object ScaleProbe {

  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
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

    def amplify(df: DataFrame, idCol: String, shift: Long): DataFrame = {
      val k = spark.range(0, copies).toDF("__copy")
      df.crossJoin(broadcast(k))
        .withColumn(idCol, col(idCol) + col("__copy") * shift)
        .drop("__copy")
    }

    // Sections isolate their caches (clearCache at each boundary): probe
    // timings must reflect the operator, not storage-memory pressure from
    // a previous section's cached relations.
    val docs = time("amplify documents") {
      val d = amplify(spark.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", 1000000L).cache()
      println(s"[probe] documents rows: ${d.count()}")
      d
    }

    time("d1 exactGroups") {
      Dedup.exactGroups(docs, col("doc_id"), col("text")).count()
    }
    time("d3 simhashBits") {
      Dedup.simhashBits(docs, col("doc_id"), col("text")).count()
    }
    val sigs = time("d2 minhash") {
      val s = Dedup.minhashSignatures(docs, col("doc_id"), col("text"), 8)
      s.count(); s
    }
    time("d2 lshBuckets") {
      Dedup.lshBuckets(sigs, 4).count()
    }
    val cands = time("d2 lshCandidatePairs") {
      val c = Dedup.lshCandidatePairs(sigs, 4)
      println(s"[probe] candidate pairs: ${c.count()}")
      c
    }
    val verified = time("d5 verifyCandidates") {
      val v = Dedup.verifyCandidates(docs, cands, col("doc_id"), col("text"),
        3, 0.3)
      println(s"[probe] verified pairs: ${v.count()}")
      v
    }
    time("d7 connectedComponents") {
      // amplification makes every doc a member of a >=10-clique (each
      // original + 9 exact copies all pair with each other) — dense
      // components, the propagation-round worst case
      Dedup.connectedComponents(verified, "doc_a", "doc_b").count()
    }
    time("d7b connectedComponentsStar (dense cliques — min-label's home turf)") {
      Dedup.connectedComponentsStar(verified, "doc_a", "doc_b").count()
    }
    time("d7b star CC on long-chain(100k) + dense-clique mix") {
      // the adversarial graph for label propagation: the verified dense
      // cliques PLUS a 100k-node chain (diameter 100k — min-label would
      // need 100k rounds); star alternation must converge in O(log²)
      val chain = spark.range(0, 100000)
        .select((col("id") + 10000000L).as("doc_a"),
          (col("id") + 10000001L).as("doc_b"))
      val mixed = verified.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .union(chain)
      Dedup.connectedComponentsStar(mixed, "doc_a", "doc_b", maxIter = 40).count()
    }
    time("d9 incrementalCandidatePairs (10% shard vs 90% index)") {
      val banded = Dedup.bandedSignatures(sigs, 4)
      Dedup.incrementalCandidatePairs(
        banded.filter(col("doc_id") % 10 === 0),
        banded.filter(col("doc_id") % 10 =!= 0)).count()
    }
    time("d9 incrementalCandidatePairs (1% shard vs 99% index)") {
      // the production steady state: a small daily shard against a big
      // persisted index — work must track the SHARD, so this should run
      // markedly faster than the 10% probe above, not the same
      val banded = Dedup.bandedSignatures(sigs, 4)
      Dedup.incrementalCandidatePairs(
        banded.filter(col("doc_id") % 100 === 0),
        banded.filter(col("doc_id") % 100 =!= 0)).count()
    }
    // the same 1% ingest against the PERSISTED BUCKETED index — the real
    // production layout: the one-time index build pays the shuffle; the
    // per-ingest query rides the bucket partitioning (cap window + join,
    // no index-side exchange — BucketingSpec)
    locally {
      val banded = Dedup.bandedSignatures(sigs, 4).localCheckpoint()
      // a previous probe run leaves the managed table's directory behind
      // while a fresh session's catalog has no entry for it — saveAsTable
      // then refuses (LOCATION_ALREADY_EXISTS); clear both sides first
      spark.sql("DROP TABLE IF EXISTS probe_band_idx")
      val wh = new java.io.File("spark-warehouse/probe_band_idx")
      def rmr(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rmr)); f.delete(): Unit
      }
      if (wh.exists) rmr(wh)
      time("d9 bucketed band-index build (one-time)") {
        Dedup.writeBandIndex(banded.filter(col("doc_id") % 100 =!= 0),
          "probe_band_idx")
      }
      time("d9 1% shard vs bucketed index (per-ingest query only)") {
        Dedup.incrementalCandidatePairs(
          banded.filter(col("doc_id") % 100 === 0),
          Dedup.readBandIndex(spark, "probe_band_idx")).count()
      }
    }
    // d10 substring dedup at 10×: identical copies make EVERY gram shared
    // (all positions marked, maximal runs everywhere) — the worst case for
    // the gram shuffle, the per-doc windows, and the span filter alike
    time("d10 duplicateNgramPositions (string grams)") {
      println(s"[probe] marked positions: " + Dedup.duplicateNgramPositions(
        docs, col("doc_id"), col("text"), 5).count())
    }
    time("d10 duplicateNgramPositions (hashed grams — the 100 TB shuffle shrink)") {
      println(s"[probe] marked positions (hashed): " + Dedup.duplicateNgramPositions(
        docs, col("doc_id"), col("text"), 5, hashGrams = true).count())
    }
    time("d10 duplicateNgramRuns (gaps-and-islands spans)") {
      Dedup.duplicateNgramRuns(docs, col("doc_id"), col("text"), 5).count()
    }
    time("d10b scrubDuplicateRuns (full scrub incl. span filter)") {
      Dedup.scrubDuplicateRuns(docs, col("doc_id"), col("text"), 5).count()
    }
    time("d4/d11 inverted-index similarity (sf-native docs, cap=100)") {
      // natural df distribution: measures the real inverted-index join
      // cost above the 150-doc oracle bound
      val d0 = spark.read.parquet(s"$sfDir/documents.parquet")
      println("[probe] jaccard pairs: " + Dedup.ngramJaccardPairs(
        d0, col("doc_id"), col("text"), 3, 0.5, maxDocFreq = 100).count())
      println("[probe] containment pairs: " + Dedup.ngramContainmentPairs(
        d0, col("doc_id"), col("text"), 3, 0.6, maxDocFreq = 100).count())
    }
    time("d11 cap defense on the 10x duplicated corpus (cap=5)") {
      // every doc has 9 exact copies, so every gram's df >= 10 — the cap
      // drops them ALL and the join does no pair work: the quadratic
      // blowup a duplicated corpus would otherwise cause is bounded by
      // the df cap, not by luck (exact dedup runs BEFORE this stage in
      // the d6 pipeline precisely so the cap only sees residual heat)
      println("[probe] containment pairs (all-dup, capped): " +
        Dedup.ngramContainmentPairs(docs, col("doc_id"), col("text"),
          3, 0.6, maxDocFreq = 5).count())
    }
    time("tx tfidf (grouped tf/df + top-term window)") {
      graft.text.TextFunctions
        .tfidfTopTerm(docs, col("doc_id"), col("text")).count()
    }
    time("x12 packPlan (per-lang token windows)") {
      graft.extensions.GraftExtensions.register(spark)
      graft.ops.Planners.packPlan(
        docs.select(col("doc_id"), col("lang"),
          graft.text.TextFunctions.tokenCountNative(col("text"))
            .cast("long").as("n_tok")),
        "lang", "doc_id", "n_tok", budget = 4096).count()
    }
    spark.catalog.clearCache()
    val emb = time("amplify embeddings") {
      val e = amplify(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        "vec_id", 1000000L).cache()
      println(s"[probe] embeddings rows: ${e.count()}")
      e
    }
    time("v2 lshBucketHistogram") {
      graft.ann.Vectors.lshBucketHistogram(emb, "vec_id", "embedding", 8, 64)
        .count()
    }
    time("v4 lshBucketTopK (8 queries)") {
      graft.ann.Vectors.lshBucketTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 5, 8, 64).count()
    }
    time("v5 ivfTopK (8 queries)") {
      graft.ann.Vectors.ivfTopK(emb, emb.filter(col("vec_id") < 8),
        "vec_id", "embedding", 5, 50).count()
    }
    time("v8 semanticNearDupPairs (maxCell=512)") {
      // identical copies collapse into the same argmax cell, so within-cell
      // pair counts grow ~copies^2 — the quantizer-granularity worst case
      // the maxCell cap bounds (cells over the cap drop out of the join)
      graft.ann.Vectors.semanticNearDupPairs(emb, "vec_id", "embedding",
        50, 0.4).count()
    }
    time("v8 semanticNearDupPairs (uncapped)") {
      // the same call with the cap lifted — the delta vs the capped run is
      // the quadratic work a degenerate cell re-introduces
      graft.ann.Vectors.semanticNearDupPairs(emb, "vec_id", "embedding",
        50, 0.4, maxCell = Int.MaxValue).count()
    }
    time("v9 kmeansCentroids (k=64, 3 iters, 10% sample)") {
      graft.ann.Vectors.kmeansCentroids(emb, "vec_id", "embedding",
        k = 64, iters = 3, sampleFrac = 0.1).count()
    }
    time("v10 int8 vs float: stored bytes + brute top-5 scan") {
      import graft.ann.Vectors
      val fdir = "/root/repo/target/probe/emb_float"
      val qdir = "/root/repo/target/probe/emb_int8"
      emb.select(col("vec_id"), col("embedding"))
        .write.mode("overwrite").parquet(fdir)
      val v = Vectors.asDouble(col("embedding"))
      emb.select(col("vec_id"), Vectors.quantizeInt8(v).as("q"),
          array_min(v).as("mn"),
          ((array_max(v) - array_min(v)) / lit(255.0)).as("sc"))
        .write.mode("overwrite").parquet(qdir)
      def bytes(p: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        walk(new java.io.File(p))
      }
      println(s"[probe] float parquet ${bytes(fdir) / 1024} KiB, " +
        s"int8 parquet ${bytes(qdir) / 1024} KiB")
      val qf = spark.read.parquet(fdir)
      time("  float brute top-5 (8 queries)") {
        Vectors.bruteForceTopK(qf, qf.filter(col("vec_id") < 8),
          "vec_id", "embedding", 5).count()
      }
      val qq = spark.read.parquet(qdir).select(col("vec_id"),
        Vectors.dequantizeInt8(col("q"), col("mn"), col("sc")).as("embedding"))
      time("  int8 dequantizing brute top-5 (8 queries)") {
        Vectors.bruteForceTopK(qq, qq.filter(col("vec_id") < 8),
          "vec_id", "embedding", 5).count()
      }
    }
    time("v12 PQ: encode (index build) + ADC query, timed separately") {
      // encoding is the ONE-TIME index-build cost; the per-query number is
      // the ADC scan over persisted codes — conflating them overstates the
      // query cost (an index is encoded once, queried forever)
      val books = graft.ann.Vectors.pqCodebooksStep(
        emb, "vec_id", "embedding", 8, 200).localCheckpoint()
      val codesDir = "/root/repo/target/probe/pq_codes"
      time("  encode: assign 8 sub-codes per vector + write") {
        graft.ann.Vectors.pqCodes(emb, "vec_id", "embedding", books, 8)
          .write.mode("overwrite").parquet(codesDir)
      }
      time("  ADC top-5 over stored codes (8 queries)") {
        // stored codes are DENSE ranks — decode to cent_ids first (the
        // pqCodesToCells inverse of the pqCodes remap)
        val stored = graft.ann.Vectors.pqCodesToCells(
          spark.read.parquet(codesDir), books)
        println("[probe] ADC rows: " + graft.ann.Vectors.pqAdcTopKFromCodes(
          stored, emb.filter(col("vec_id") < 8),
          "vec_id", "embedding", books, 8, 5).count())
      }
    }
    time("v11 pqTrain (m=8, k=64, 3 iters, 10% sample)") {
      graft.ann.Vectors.pqTrain(emb, "vec_id", "embedding",
        m = 8, k = 64, iters = 3, sampleFrac = 0.1).count()
    }
    time("v13 IVF-PQ: index build + probed-cell query, timed separately") {
      import graft.ann.Vectors
      val books = Vectors.pqCodebooksStep(emb, "vec_id", "embedding", 8, 200)
        .localCheckpoint()
      // expose the step-rule quantizer the same way ivfTopK derives it
      val cents = emb.select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("cent_id"),
          Vectors.asDouble(col("embedding")).as("cv"))
        .withColumn("cvn", graft.ann.Vectors.l2norm(col("cv")))
        .localCheckpoint()
      val idxDir = "/root/repo/target/probe/ivfpq_index"
      time("  index build: PQ codes + coarse cell per vector + write") {
        Vectors.ivfPqIndex(emb, "vec_id", "embedding", cents, books, 8)
          .write.mode("overwrite").parquet(idxDir)
      }
      time("  probed-cell ADC top-5 over the stored index (8 queries, nprobe=2)") {
        Vectors.ivfPqTopKFromIndex(spark.read.parquet(idxDir),
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          cents, books, 8, 5, nprobe = 2).count()
      }
    }
    time("v15 IVF-PQ incremental append: 1% shard vs full rebuild") {
      import graft.ann.Vectors
      // shard on residue 7, NOT 0: the step-rule quantizers sample
      // vec_id % step == 0 ids, and every id divisible by 200 is also
      // divisible by 100 — a %100==0 shard would leave the BASE with
      // zero codebook samples (empty books -> empty index -> NULL MSE)
      val base = emb.filter(col("vec_id") % 100 =!= 7)
      val shard = emb.filter(col("vec_id") % 100 === 7)
      val books = Vectors.pqCodebooksStep(base, "vec_id", "embedding", 8, 200)
        .localCheckpoint()
      val cents = Vectors.stepCentroids(base, "vec_id", "embedding", 50)
        .localCheckpoint()
      time("  base index build + bucketed write (one-time)") {
        Vectors.writeIvfPqIndex(
          Vectors.ivfPqIndex(base, "vec_id", "embedding", cents, books, 8),
          "probe_ivfpq_idx")
      }
      val baseMse = time("  drift baseline meanPqMse over the base (recorded once at build)") {
        Vectors.meanPqMse(base, "vec_id", "embedding", books, 8)
      }
      time("  append 1% shard (drift check + encode shard + bucketed insert)") {
        // ingest cost must track the SHARD: this number should sit far
        // below the base build above, and stay flat as the index grows
        Vectors.appendToIvfPqIndex("probe_ivfpq_idx", shard,
          "vec_id", "embedding", cents, books, 8, baselineMse = baseMse)
      }
      time("  the avoided alternative: re-encode the whole corpus") {
        Vectors.ivfPqIndex(emb, "vec_id", "embedding", cents, books, 8).count()
      }
      time("  probed query over the appended index (8 queries, nprobe=2)") {
        println("[probe] appended-index topk rows: " +
          Vectors.ivfPqTopKFromIndex(Vectors.readIvfPqIndex(spark, "probe_ivfpq_idx"),
            emb.filter(col("vec_id") < 8), "vec_id", "embedding",
            cents, books, 8, 5, nprobe = 2).count())
      }
    }
    time("u4 Y4M demux throughput (50k synthesized clips, ~16 MB of frames)") {
      // in-query container synthesis + real demux at the amplified doc
      // count: measures the mapPartitions decode edge, not file IO
      import graft.multimodal.Multimodal
      val nf = (col("doc_id") % 4 + 2).cast("int")
      val vids = docs.select(col("doc_id").cast("string").as("path"),
        Multimodal.y4mVideo((col("doc_id") % 12 + 4).cast("int"),
          (col("doc_id") % 5 + 2).cast("int"),
          transform(sequence(lit(0), nf - 1),
            j => (col("doc_id") * 7 + j * 13) % 256)).as("content"))
      println("[probe] demuxed frames: " +
        Multimodal.demuxY4m(vids, stride = 1, maxFrames = 8).count())
    }
    spark.catalog.clearCache()
    val events = time("amplify events (same 150 users, 10x rows each)") {
      // Tables.load owns the nanos->micros ts normalization
      val e = amplify(graft.core.Tables.load(spark, sfDir, "events"),
        "event_id", 100000000L).cache()
      println(s"[probe] events rows: ${e.count()}")
      e
    }
    time("t7 sessionize (hot-user axis)") {
      graft.ops.Sessionize.sessions(
        events, "user_id", "ts", "event_id", 8 * 3600L, col("value"))
        .count()
    }
    spark.catalog.clearCache()
    val orders = time("amplify orders") {
      val o = amplify(spark.read.parquet(s"$sfDir/orders.parquet"),
        "o_orderkey", 100000000L).cache()
      println(s"[probe] orders rows: ${o.count()}")
      o
    }
    val fracs = Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.3, "3-MEDIUM" -> 0.2,
      "4-NOT SPECIFIED" -> 0.1, "5-LOW" -> 0.05)
    time("x1 stratifiedExact (window form)") {
      Sampling.stratifiedExact(orders, col("o_orderpriority"), col("o_orderkey"),
        fracs).count()
    }
    time("x1 stratifiedExactDistributed") {
      Sampling.stratifiedExactDistributed(orders, col("o_orderpriority"),
        col("o_orderkey"), fracs).count()
    }
    time("x3 shufflePositionDistributed") {
      Sampling.shufflePositionDistributed(
        Sampling.bernoulli(orders, col("o_orderkey"), 0.05)
          .select("o_orderkey"), col("o_orderkey")).count()
    }
    // x8 A/B: AQE runtime skew-join splitting vs manual deterministic
    // salting, on a planted hot key (half the fact rows share one key).
    // The dim is forced non-broadcast — with a broadcastable dim neither
    // technique is needed, which is always the first fix to try.
    locally {
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
        time("x8 plain SMJ, AQE skew-join OFF (one straggler reducer)") { run() }
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        // defaults only fire at 256 MB-sized partitions; scale the
        // thresholds to probe size so the splitting actually engages
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        time("x8 plain SMJ, AQE skew-join ON (runtime split, zero code)") { run() }
        time("x8 saltedJoin (32 buckets, deterministic salt)") {
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
    }
    time("x9 clusterByZ write (z-order layout, 64 files)") {
      val dir = "/root/repo/target/probe/zorder"
      graft.ops.Layout.clusterByZ(
          orders.select("o_orderkey", "o_custkey", "o_totalprice"),
          col("o_custkey"), col("o_orderkey"), numFiles = 64)
        .write.mode("overwrite").parquet(dir)
    }
    time("s12 compaction plan (cumulative bin-pack per partition)") {
      // the s12 shape at 10×: per-priority running-size window assigns each
      // "file" to a target output group; the window partitions by the
      // (bounded-cardinality) table partition key, which is the honest
      // at-scale cost of a compaction planner
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_orderpriority").orderBy("o_orderkey")
      orders
        .withColumn("grp", floor(
          (sum(col("o_totalprice")).over(w) - col("o_totalprice")) / 1e7))
        .groupBy("o_orderpriority", "grp")
        .agg(count(lit(1)).as("n_files"), sum("o_totalprice").as("group_bytes"))
        .count()
    }
    // s15 snapshots: MERGE-chain replay cost vs chain length, and the
    // compaction win — epoch 0 is the full keyed table, epochs 1..19 are
    // 5% keyed refreshes (the daily-ingest shape)
    locally {
      import graft.ops.Snapshots
      val dir = "/root/repo/target/probe/snapshots"
      def rmr(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rmr)); f.delete(): Unit
      }
      rmr(new java.io.File(dir))
      time("s15 write 20-epoch chain (1.5M base + 19 × 5% refreshes)") {
        Snapshots.writeEpoch(orders.select(col("o_orderkey"),
          col("o_totalprice").as("price"), lit(false).as("_deleted")), dir, 0)
        (1 to 19).foreach { v =>
          Snapshots.writeEpoch(orders.filter(col("o_orderkey") % 20 === v)
            .select(col("o_orderkey"), (col("o_totalprice") * v).as("price"),
              lit(false).as("_deleted")), dir, v)
        }
      }
      time("s15 readAsOf(19) — LWW over all 20 epochs") {
        Snapshots.readAsOf(spark, dir, Seq("o_orderkey"), 19).count()
      }
      time("s15 readAsOf(4) — partition-pruned to 5 epochs") {
        Snapshots.readAsOf(spark, dir, Seq("o_orderkey"), 4).count()
      }
      time("s15 compactTo(15) + readAsOf(19) over the 5 remaining epochs") {
        Snapshots.compactTo(spark, dir, Seq("o_orderkey"), 15)
        Snapshots.readAsOf(spark, dir, Seq("o_orderkey"), 19).count()
      }
    }
    time("trainingFeed end-to-end (distributed, 3-asset manifest)") {
      // synthesize the reference manifest shape from the amplified orders:
      // 3 asset keys per stem → manifest rows = 3 × orders; the feed then
      // runs filter → stem/type/difficulty → triplet join → distributed
      // stratified sample → distributed shuffle position
      val diff = when(col("o_orderpriority").startsWith("1-"), "hard")
        .when(col("o_orderpriority").startsWith("2-"), "medium")
        .otherwise("easy")
      val manifest = orders
        .select(col("o_orderkey"), diff.as("diff"))
        .withColumn("suffix",
          explode(array(lit("person"), lit("cloth_a"), lit("vton"))))
        .select(
          concat(lit("s3://b/"), col("diff"), lit("/stem"), col("o_orderkey"),
            lit("_"), col("suffix"), lit(".jpg")).as("key"),
          concat(lit("s3://b/"), col("diff"), lit("/")).as("prefix"))
      graft.pipelines.Pipelines.trainingFeed(manifest,
        Map("easy" -> 0.25, "medium" -> 0.25, "hard" -> 0.5)).count()
    }
    spark.stop()
  }
}
