package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  import spark.implicits._

  test("join of two co-bucketed tables plans with NO exchange (co-located join)") {
    val orders = Tables.load(spark, sf0001, "orders")
    val customer = Tables.load(spark, sf0001, "customer")
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "customer_b", "c_custkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a shuffle-family join so the assertion is about bucketing,
      // not about the small side being broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(spark, "orders_b")
        .join(Bucketing.readBucketed(spark, "customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      // and it still computes the right thing
      val n = joined.count()
      val want = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(n === want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("ingest join against the bucketed band index shuffles ONLY the shard side") {
    import graft.dedup.Dedup
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow tonight",
      "how vexingly quick daft zebras jump around")
    val docs = (0L until 40L).map(i => (i, texts((i % 4).toInt)))
      .toDF("doc_id", "text")
    def bandedOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.bandedSignatures(
        Dedup.minhashSignatures(df, col("doc_id"), col("text"), 8), 4)
    val index = bandedOf(docs.filter(col("doc_id") < 30))
    val shard = bandedOf(docs.filter(col("doc_id") >= 30))
    Dedup.writeBandIndex(index, "band_index_b", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
      val viaBucketed = Dedup.incrementalCandidatePairs(
        shard, Dedup.readBandIndex(spark, "band_index_b"))
      val viaRaw = Dedup.incrementalCandidatePairs(shard, index)
      // the bucketed index branch (cap window + band join) rides the bucket
      // partitioning: strictly fewer exchanges than the unbucketed plan
      assert(exchanges(viaBucketed) < exchanges(viaRaw),
        viaBucketed.queryExecution.executedPlan.toString)
      // and identical pairs either way
      assert(viaBucketed.as[(Long, Long)].collect().toSet ===
        viaRaw.as[(Long, Long)].collect().toSet)
      // the d9 ingest LOOP: fold the verified shard into the index, query
      // the next shard against it — equals the all-in-memory computation
      Dedup.appendBandIndex(shard, "band_index_b", 8)
      val shard2 = bandedOf(docs.filter(col("doc_id") >= 30)
        .withColumn("doc_id", col("doc_id") + 100))
      val wantNext = Dedup.incrementalCandidatePairs(shard2, index.union(shard))
        .as[(Long, Long)].collect().toSet
      def viaIdx() = Dedup.incrementalCandidatePairs(
          shard2, Dedup.readBandIndex(spark, "band_index_b"))
        .as[(Long, Long)].collect().toSet
      assert(viaIdx() === wantNext)
      // compaction collapses the append's extra file set and changes nothing
      val before = Bucketing.dataFiles(spark, "band_index_b").size
      Bucketing.compactBucketed(spark, "band_index_b")
      assert(Bucketing.dataFiles(spark, "band_index_b").size < before)
      assert(viaIdx() === wantNext)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed IVF-PQ index: probed query matches in-memory; cell scans prune buckets; per-cell agg has no exchange") {
    import graft.ann.Vectors
    val rnd = new scala.util.Random(29)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val m = 2
    val books = Vectors.pqCodebooksStep(vecs, "vec_id", "embedding", m, 10)
    val cents = Vectors.stepCentroids(vecs, "vec_id", "embedding", 10)
    val index = Vectors.ivfPqIndex(vecs, "vec_id", "embedding", cents, books, m)
    Vectors.writeIvfPqIndex(index, "ivfpq_index_b", 8)
    val back = Vectors.readIvfPqIndex(spark, "ivfpq_index_b")
    val q = vecs.filter(col("vec_id") < 2)
    // identical results through the persisted index
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(Vectors.ivfPqTopKFromIndex(back, q, "vec_id", "embedding",
        cents, books, m, 5, nprobe = 2)) ===
      rows(Vectors.ivfPqTopKFromIndex(index, q, "vec_id", "embedding",
        cents, books, m, 5, nprobe = 2)))
    // a literal probed-cell filter scans only the buckets those cells hash
    // to — the 100-TB read path: nprobe cells out of the whole index.
    // autoBucketedScan must be pinned off: for a filter-only query the
    // planner assumes a non-bucketed scan is just as good and silently
    // forfeits bucket pruning
    val prevAuto = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    val scan = try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      back.filter(col("ivf_cell").isin(0L, 10L))
        .queryExecution.executedPlan.toString
    } finally spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
    assert(scan.contains("SelectedBucketsCount"), scan)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(scan).get
    assert(sel.group(1).toInt < sel.group(2).toInt, scan)
    // per-cell maintenance aggregation rides the bucket partitioning
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = back.groupBy("ivf_cell").agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("incremental IVF-PQ append: append==rebuild, pruning survives, drift guard refuses") {
    import graft.ann.Vectors
    val rnd = new scala.util.Random(31)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val base = vecs.filter(col("vec_id") < 45)
    val shard = vecs.filter(col("vec_id") >= 45)
    val m = 2
    // quantizers frozen at base-build time — the incremental contract
    val books = Vectors.pqCodebooksStep(base, "vec_id", "embedding", m, 10)
    val cents = Vectors.stepCentroids(base, "vec_id", "embedding", 10)
    val baseMse = Vectors.meanPqMse(base, "vec_id", "embedding", books, m)
    Vectors.writeIvfPqIndex(
      Vectors.ivfPqIndex(base, "vec_id", "embedding", cents, books, m),
      "ivfpq_append_b", 8)
    val shardMse = Vectors.appendToIvfPqIndex("ivfpq_append_b", shard,
      "vec_id", "embedding", cents, books, m, baselineMse = baseMse, buckets = 8)
    assert(shardMse >= 0.0)
    val back = Vectors.readIvfPqIndex(spark, "ivfpq_append_b")
    assert(back.count() === vecs.count() * m)
    // append-then-query == rebuild-then-query on the union
    val rebuilt = Vectors.ivfPqIndex(vecs, "vec_id", "embedding", cents, books, m)
    val q = vecs.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(Vectors.ivfPqTopKFromIndex(back, q, "vec_id", "embedding",
        cents, books, m, 5, nprobe = 2)) ===
      rows(Vectors.ivfPqTopKFromIndex(rebuilt, q, "vec_id", "embedding",
        cents, books, m, 5, nprobe = 2)))
    // bucket pruning survives the append (appended files carry bucket ids)
    val prevAuto = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    val scan = try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      back.filter(col("ivf_cell").isin(0L, 10L))
        .queryExecution.executedPlan.toString
    } finally spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
    assert(scan.contains("SelectedBucketsCount"), scan)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(scan).get
    assert(sel.group(1).toInt < sel.group(2).toInt, scan)
    // drift guard: a shard from a shifted distribution (×100 scale) must
    // refuse loudly instead of silently degrading recall
    val drifted = shard.select((col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"), x => x * 100).as("embedding"))
    val e = intercept[IllegalStateException] {
      Vectors.appendToIvfPqIndex("ivfpq_append_b", drifted,
        "vec_id", "embedding", cents, books, m,
        baselineMse = baseMse, buckets = 8)
    }
    assert(e.getMessage.contains("retrain"))
    // the refused shard must NOT have been inserted
    assert(Vectors.readIvfPqIndex(spark, "ivfpq_append_b").count() ===
      vecs.count() * m)
  }

  test("append edge cases: empty shard no-ops with NaN; zero baseline admits rounding noise, refuses real drift") {
    import graft.ann.Vectors
    // degenerate base: identical vectors — every codebook sample IS the
    // vector, so the recorded baseline MSE is exactly 0.0
    val base = (0L until 20L).map(i => (i, Array.fill(8)(1.0)))
      .toDF("vec_id", "embedding")
    val m = 2
    val books = Vectors.pqCodebooksStep(base, "vec_id", "embedding", m, 4)
    val cents = Vectors.stepCentroids(base, "vec_id", "embedding", 4)
    val baseMse = Vectors.meanPqMse(base, "vec_id", "embedding", books, m)
    assert(baseMse === 0.0)
    Vectors.writeIvfPqIndex(
      Vectors.ivfPqIndex(base, "vec_id", "embedding", cents, books, m),
      "ivfpq_edge_b", 8)
    // (a) EMPTY shard: documented no-op — NaN back, nothing inserted,
    // no NPE from the NULL mean
    val empty = base.filter(col("vec_id") < 0)
    assert(Vectors.meanPqMse(empty, "vec_id", "embedding", books, m).isNaN)
    val r = Vectors.appendToIvfPqIndex("ivfpq_edge_b", empty,
      "vec_id", "embedding", cents, books, m, baselineMse = baseMse, buckets = 8)
    assert(r.isNaN)
    assert(Vectors.readIvfPqIndex(spark, "ivfpq_edge_b").count() === 20L * m)
    // (b) zero baseline + one-quantum shard error (noise 8e-4 per element
    // -> per-vector MSE 6.4e-7, rounds to the 1e-6 quantum): the bare
    // multiplicative guard would refuse ANY nonzero error against a 0.0
    // baseline; the additive quantum epsilon admits it
    val noisy = (100L until 110L).map(i => (i, Array.fill(8)(1.0 + 8e-4)))
      .toDF("vec_id", "embedding")
    val mse = Vectors.appendToIvfPqIndex("ivfpq_edge_b", noisy,
      "vec_id", "embedding", cents, books, m, baselineMse = 0.0, buckets = 8)
    assert(mse > 0.0 && mse <= 1e-6, mse)
    assert(Vectors.readIvfPqIndex(spark, "ivfpq_edge_b").count() === 30L * m)
    // (b2) NO baseline (NaN): guard disabled entirely — the append must
    // succeed for any shard error (BigDecimal(NaN) once threw here)
    val unguarded = (300L until 305L).map(i => (i, Array.fill(8)(1.0 + 3e-3)))
      .toDF("vec_id", "embedding")
    Vectors.appendToIvfPqIndex("ivfpq_edge_b", unguarded,
      "vec_id", "embedding", cents, books, m, buckets = 8)
    assert(Vectors.readIvfPqIndex(spark, "ivfpq_edge_b").count() === 35L * m)
    // (c) zero baseline does NOT disable the guard: genuine drift
    // (orders of magnitude above the quantum) is still refused
    val drifted = (200L until 210L).map(i =>
      (i, Array.fill(8)(new scala.util.Random(i).nextGaussian() * 50)))
      .toDF("vec_id", "embedding")
    intercept[IllegalStateException] {
      Vectors.appendToIvfPqIndex("ivfpq_edge_b", drifted,
        "vec_id", "embedding", cents, books, m, baselineMse = 0.0, buckets = 8)
    }
    assert(Vectors.readIvfPqIndex(spark, "ivfpq_edge_b").count() === 35L * m)
  }

  test("IVF-PQ tombstone deletes: delete-then-query == rebuild-without-deleted; compaction drops rows physically") {
    import graft.ann.Vectors
    val rnd = new scala.util.Random(37)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val m = 2
    val books = Vectors.pqCodebooksStep(vecs, "vec_id", "embedding", m, 10)
    val cents = Vectors.stepCentroids(vecs, "vec_id", "embedding", 10)
    Vectors.writeIvfPqIndex(
      Vectors.ivfPqIndex(vecs, "vec_id", "embedding", cents, books, m),
      "ivfpq_del_b", 8)
    val q = vecs.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Int)].collect().toSet
    def queryIdx() = rows(Vectors.ivfPqTopKFromIndex(
      Vectors.readIvfPqIndex(spark, "ivfpq_del_b"), q, "vec_id", "embedding",
      cents, books, m, 5, nprobe = 2))
    // doom ids the CURRENT top-k actually returns, so the delete must
    // change the result (top-k structs are (query_id, vec_id, dist, rank))
    val doomed = queryIdx().map(_._2).toSeq.distinct.sorted.take(3)
    val kept = vecs.filter(!col("vec_id").isin(doomed: _*))
    // the oracle: an index rebuilt WITHOUT the deleted vectors
    val want = rows(Vectors.ivfPqTopKFromIndex(
      Vectors.ivfPqIndex(kept, "vec_id", "embedding", cents, books, m),
      q, "vec_id", "embedding", cents, books, m, 5, nprobe = 2))
    assert(queryIdx() !== want,
      "precondition: deleting returned ids must change the result")
    Vectors.deleteFromIvfPqIndex(spark, "ivfpq_del_b",
      doomed.toDF("vec_id"))
    // logical delete: visible immediately, no file rewritten
    assert(queryIdx() === want)
    assert(spark.table("ivfpq_del_b").count() === 60L * m, "rows rewritten early")
    // physical drop at compaction; tombstones cleared; results unchanged
    Vectors.compactIvfPqIndex(spark, "ivfpq_del_b")
    assert(spark.table("ivfpq_del_b").count() === (60L - doomed.size) * m)
    assert(!spark.catalog.tableExists(Vectors.tombstoneTable("ivfpq_del_b")))
    assert(queryIdx() === want)
    // a fresh write of the same name must not inherit stale tombstones
    Vectors.deleteFromIvfPqIndex(spark, "ivfpq_del_b", Seq(0L).toDF("vec_id"))
    Vectors.writeIvfPqIndex(
      Vectors.ivfPqIndex(vecs, "vec_id", "embedding", cents, books, m),
      "ivfpq_del_b", 8)
    assert(spark.table("ivfpq_del_b").count() === 60L * m)
    assert(!spark.catalog.tableExists(Vectors.tombstoneTable("ivfpq_del_b")))
  }

  test("compactBucketed: N appends collapse to one file per bucket; pruning and no-exchange survive") {
    val buckets = 4
    def rowsAt(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, s"payload_$i")).toDF("k", "v")
    Bucketing.writeBucketed(rowsAt(0, 100), "compact_t", "k", buckets)
    (1 to 3).foreach { a =>
      Bucketing.appendBucketed(rowsAt(a * 100L, a * 100L + 100), "compact_t",
        "k", buckets)
    }
    // each append lands its own file set: strictly more files than buckets
    val before = Bucketing.dataFiles(spark, "compact_t")
    assert(before.size > buckets, s"expected growth, got ${before.size} files")
    val want = spark.table("compact_t").as[(Long, String)].collect().toSet
    Bucketing.compactBucketed(spark, "compact_t")
    // one file per bucket, same rows, bucket spec preserved
    val after = Bucketing.dataFiles(spark, "compact_t")
    assert(after.size === buckets, s"not compacted: $after")
    assert(spark.table("compact_t").as[(Long, String)].collect().toSet === want)
    val spec = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("compact_t")).bucketSpec
    assert(spec.exists(s => s.numBuckets == buckets &&
      s.bucketColumnNames == Seq("k") && s.sortColumnNames == Seq("k")))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // bucket pruning: an equality filter on the bucket key reads 1 bucket
      // (plan check needs the bucketed scan forced on, as elsewhere)
      val prevAuto = spark.conf
        .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      val pruned = spark.table("compact_t").filter(col("k") === 42L)
      val scan = try {
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        pruned.queryExecution.executedPlan.toString
      } finally spark.conf
        .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      assert(scan.contains(s"SelectedBucketsCount: 1 out of $buckets"), scan)
      assert(pruned.count() === 1L)
      // co-located aggregation: still no exchange after the rewrite
      val agg = spark.table("compact_t").groupBy("k").agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("writeBucketed refuses qualified table names (stale-location path would target the wrong directory)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(df, "somedb.tbl", "k", 4)
    }
    intercept[IllegalArgumentException] {
      Bucketing.writeBucketed(df, "`weird`", "k", 4)
    }
  }

  test("semantic index: incremental pairs are new×index + new×new; append folds the shard") {
    import graft.ann.Vectors
    // unit vectors by ANGLE in the xy-plane: minCosine 0.99 admits pairs
    // within ~8.1°, so planted pairs sit 1° apart and every other pair
    // is >= 14.5° apart; cells split at 45° (centroids = step-3 vectors
    // 0° and 90°)
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0.0f, 0.0f)
    }
    val base = Seq(
      0L -> at(0), 1L -> at(20), 3L -> at(90), 4L -> at(60))
      .toDF("vec_id", "emb")
    val cents = Vectors.stepCentroids(base, "vec_id", "emb", 3)
      .localCheckpoint()
    spark.sql("DROP TABLE IF EXISTS sem_idx_spec")
    Vectors.writeSemanticIndex(base, "vec_id", "emb", cents,
      "sem_idx_spec", buckets = 4)
    // shard: 100 is 1° from base 0 (new×index); 101/102 are 1° apart in
    // the other cell (new×new); nothing else clears the threshold
    val shard = Seq(100L -> at(1), 101L -> at(75), 102L -> at(76))
      .toDF("vec_id", "emb")
    try {
      val got = Vectors.incrementalSemanticPairs(shard, "vec_id", "emb",
          cents, Vectors.readSemanticIndex(spark, "sem_idx_spec"),
          minCosine = 0.99)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(got === Set((0L, 100L), (101L, 102L)), s"got $got")
      // ground truth: the batch SemDeDup pairs over base ∪ shard,
      // restricted to at-least-one-new — identical
      val want = Vectors.semanticNearDupPairsWith(base.union(shard),
          "vec_id", "emb", cents, minCosine = 0.99)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
        .filter(p => (p._1 >= 100L) || (p._2 >= 100L))
      assert(got === want)
      // fold the shard in; a later shard then pairs against it via the
      // index alone (the day-3 ingest)
      Vectors.appendToSemanticIndex(shard, "vec_id", "emb", cents,
        "sem_idx_spec", buckets = 4)
      val day3 = Seq(200L -> at(75.5)).toDF("vec_id", "emb")
      val got3 = Vectors.incrementalSemanticPairs(day3, "vec_id", "emb",
          cents, Vectors.readSemanticIndex(spark, "sem_idx_spec"),
          minCosine = 0.99)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(got3 === Set((101L, 200L), (102L, 200L)), s"got $got3")
    } finally spark.sql("DROP TABLE IF EXISTS sem_idx_spec")
  }

  test("ingestOnce: rerun is a no-op; replayed append heals at compaction, shuffle-free") {
    import org.apache.spark.sql.functions._
    val rows = (0L until 40L).map(i => (i, s"v$i")).toDF("k", "v")
    val shard = (100L until 110L).map(i => (i, s"v$i")).toDF("k", "v")
    spark.sql("DROP TABLE IF EXISTS ing_once_t")
    spark.sql("DROP TABLE IF EXISTS ing_once_t__ingests")
    try {
      Bucketing.writeBucketed(rows, "ing_once_t", "k", 4)
      // day-2 ingest under the guard
      val ran = Bucketing.ingestOnce(spark, "ing_once_t", "day-2") {
        Bucketing.appendBucketed(shard, "ing_once_t", "k", 4)
      }
      assert(ran && spark.table("ing_once_t").count() === 50)
      // scheduler retries the SAME day: guard makes it a no-op
      val reran = Bucketing.ingestOnce(spark, "ing_once_t", "day-2") {
        Bucketing.appendBucketed(shard, "ing_once_t", "k", 4)
      }
      assert(!reran && spark.table("ing_once_t").count() === 50)
      // crash WINDOW: append completed but the marker write was lost —
      // the rerun re-appends (at-least-once) and the next compaction
      // heals the exact duplicates inside the same shuffle-free pass
      Bucketing.appendBucketed(shard, "ing_once_t", "k", 4)
      assert(spark.table("ing_once_t").count() === 60)
      Bucketing.compactBucketed(spark, "ing_once_t",
        transform = _.dropDuplicates())
      assert(spark.table("ing_once_t").count() === 50)
      assert(Bucketing.dataFiles(spark, "ing_once_t").size === 4)
      // and the healed table is byte-equal to the intended content
      val got = spark.table("ing_once_t").as[(Long, String)].collect().toSet
      assert(got === (rows.as[(Long, String)].collect().toSet ++
        shard.as[(Long, String)].collect().toSet))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ing_once_t")
      spark.sql("DROP TABLE IF EXISTS ing_once_t__ingests")
    }
  }

  test("dropDuplicates rides the bucketed scan with no exchange (dedupe keys ⊇ bucket key)") {
    import org.apache.spark.sql.functions._
    val rows = (0L until 40L).map(i => (i, s"v$i")).toDF("k", "v")
    spark.sql("DROP TABLE IF EXISTS dedupe_scan_t")
    try {
      Bucketing.writeBucketed(rows, "dedupe_scan_t", "k", 4)
      val autoScan = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prev = spark.conf.get(autoScan)
      try {
        spark.conf.set(autoScan, "false")
        val plan = spark.table("dedupe_scan_t").dropDuplicates()
          .queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan)
      } finally spark.conf.set(autoScan, prev)
    } finally spark.sql("DROP TABLE IF EXISTS dedupe_scan_t")
  }

  test("aggregation on the bucket key needs no exchange either") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = Bucketing.readBucketed(spark, "orders_b")
        .groupBy("o_custkey").agg(sum("o_totalprice"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("quantizer refresh: retrain+epoch-swap == fresh rebuild; tombstones clear; pruning survives; ingest resumes") {
    import graft.ann.Vectors
    val rnd = new scala.util.Random(41)
    val base = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val m = 2
    val staleBooks = Vectors.pqCodebooksStep(base, "vec_id", "embedding", m, 10)
    val staleCents = Vectors.stepCentroids(base, "vec_id", "embedding", 10)
    val baseMse = Vectors.meanPqMse(base, "vec_id", "embedding", staleBooks, m)
    val tbl = "ivfpq_refresh_b"
    Vectors.writeIvfPqIndex(
      Vectors.ivfPqIndex(base, "vec_id", "embedding", staleCents, staleBooks, m),
      tbl, 8)
    // the embedding distribution shifts: today's shard is REFUSED by the
    // drift guard — the situation this operator remediates
    val drifted = (50L until 110L).map(i =>
      (i, Array.fill(8)(new scala.util.Random(i).nextGaussian() + 5)))
      .toDF("vec_id", "embedding")
    intercept[IllegalStateException] {
      Vectors.appendToIvfPqIndex(tbl, drifted, "vec_id", "embedding",
        staleCents, staleBooks, m, baselineMse = baseMse, buckets = 8)
    }
    // a tombstone recorded against the OLD epoch (deletion already applied
    // to the corpus the refresh will re-encode)
    Vectors.deleteFromIvfPqIndex(spark, tbl, Seq(3L).toDF("vec_id"))
    assert(Vectors.readIvfPqIndex(spark, tbl)
      .filter(col("vec_id") === 3L).count() === 0)
    // REMEDIATION: one retrain + re-encode + epoch swap on the current corpus
    val corpus = base.filter(col("vec_id") =!= 3L).union(drifted)
    val (cents, books, newBase) = Vectors.retrainIvfPq(spark, tbl, corpus,
      "vec_id", "embedding", k = 6, m = m, codes = 8, iters = 2, buckets = 8)
    // refresh == fresh rebuild under the same (deterministically trained)
    // quantizers — identical index rows...
    val fresh = Vectors.ivfPqIndex(corpus, "vec_id", "embedding", cents, books, m)
    def idx(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("sub"), col("cell"), col("ivf_cell"))
        .as[(Long, Int, Long, Long)].collect().toSet
    assert(idx(spark.table(tbl)) === idx(fresh))
    // ...and identical top-k through the production read path
    val q = corpus.filter(col("vec_id") < 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Int)].collect().toSet
    assert(rows(Vectors.ivfPqTopKFromIndex(Vectors.readIvfPqIndex(spark, tbl),
        q, "vec_id", "embedding", cents, books, m, 5, nprobe = 2)) ===
      rows(Vectors.ivfPqTopKFromIndex(fresh, q, "vec_id", "embedding",
        cents, books, m, 5, nprobe = 2)))
    // old-epoch tombstones are gone (the corpus is the source of truth)
    assert(!spark.catalog.tableExists(Vectors.tombstoneTable(tbl)))
    // the refreshed quantizers actually fit the new distribution better
    assert(newBase <
      Vectors.meanPqMse(corpus, "vec_id", "embedding", staleBooks, m))
    // bucket pruning survives the epoch swap
    val prevAuto = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    val scan = try {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      spark.table(tbl).filter(col("ivf_cell").isin(0L, 1L))
        .queryExecution.executedPlan.toString
    } finally spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(scan).get
    assert(sel.group(1).toInt < sel.group(2).toInt, scan)
    // day-2 ingest RESUMES: a shard from the (now in-distribution) drifted
    // population appends cleanly under the returned baseline
    val nextShard = (200L until 210L).map(i =>
      (i, Array.fill(8)(new scala.util.Random(i + 7).nextGaussian() + 5)))
      .toDF("vec_id", "embedding")
    Vectors.appendToIvfPqIndex(tbl, nextShard, "vec_id", "embedding",
      cents, books, m, baselineMse = newBase, buckets = 8)
    assert(spark.table(tbl).count() === (corpus.count() + 10) * m)
  }

  test("semantic index refresh: epoch swap re-assigns under new centroids; shard ingest resumes") {
    import graft.ann.Vectors
    val rnd = new scala.util.Random(43)
    val corpus0 = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    val staleCents = Vectors.stepCentroids(corpus0, "vec_id", "embedding", 10)
    val tbl = "sem_refresh_b"
    Vectors.writeSemanticIndex(corpus0, "vec_id", "embedding", staleCents, tbl, 8)
    // distribution shifts; refresh re-assigns the CURRENT corpus under
    // centroids trained on it
    val corpus = corpus0.union((100L until 140L).map(i =>
        (i, Array.fill(8)(new scala.util.Random(i).nextGaussian() + 5)))
      .toDF("vec_id", "embedding"))
    val cents = Vectors.retrainSemanticIndex(spark, tbl, corpus,
      "vec_id", "embedding", k = 4, iters = 2, buckets = 8)
    // the live table holds exactly the corpus, assigned per the returned cents
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell")).as[(Long, Long)].collect().toSet
    assert(cellsOf(spark.table(tbl)) ===
      cellsOf(Vectors.semanticIndex(corpus, "vec_id", "embedding", cents)))
    // day-2 folding resumes against the new frozen cents
    val shard = (200L until 205L).map(i =>
      (i, Array.fill(8)(new scala.util.Random(i).nextGaussian() + 5)))
      .toDF("vec_id", "embedding")
    Vectors.appendToSemanticIndex(shard, "vec_id", "embedding", cents, tbl, 8)
    assert(spark.table(tbl).count() === corpus.count() + 5)
  }
}
