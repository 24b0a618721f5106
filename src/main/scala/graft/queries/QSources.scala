package graft.queries

import graft.core.Tables
import graft.ops.ManifestOps
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink queries beyond plain parquet scans: the CSV pairs file
  * (SURVEY S5), the pairs fan-out join through ManifestOps.pairsJoin
  * (J2), and the sync manifest diff (S9).
  */
object QSources {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Fixture root: the s5 query materializes a real pairs CSV here (derived
    * deterministically from the orders table of the current scale factor)
    * and reads it back, so the oracle can read the identical file with
    * read_csv. One FIXED path: the query writes before reading, and the
    * driver's DuckDB compare runs immediately after Verify, so the file
    * always reflects the scale factor being verified (an SF-keyed path
    * would pin the oracle to one hardcoded SF instead).
    */
  def pairsFixtureDir(sfDir: String): String =
    "/root/repo/target/fixtures/pairs_csv"

  private def writePairsFixture(s: SparkSession, d: String): String = {
    val dir = pairsFixtureDir(d)
    Sources.writePairs(
      t(s, d, "orders").filter(col("o_orderkey") % 20 === 0)
        .select(col("o_custkey").as("person_id"),
          (col("o_orderkey") % 100 + 1).as("garment_id")),
      dir)
    dir
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S5: schema'd space-delimited CSV read (train_pairs.txt shape), then a
    // fan-out join to the person-side dimension.
    "s5_pairs_csv" -> ((s, d) => {
      val dir = writePairsFixture(s, d)
      Sources.readPairs(s, dir)
        .join(t(s, d, "customer"), col("person_id") === col("c_custkey"))
        .select(col("person_id"), col("garment_id"), col("c_name"))
    }),

    // S17: JSONL round-trip — THE LLM-data interchange format (every
    // public corpus ships as line-delimited JSON). Write a documents
    // slice as JSONL, read it back with an EXPLICIT schema (inference
    // is an extra full pass and type-nondeterministic at scale — never
    // infer on a 100 TB corpus), hash the text through the round-trip.
    // JSONL is splittable line-by-line, so the read parallelizes like
    // any file source; the oracle reads the original table, putting the
    // writer's escaping AND the reader's parsing on the hash hook.
    "s17_jsonl_roundtrip" -> ((s, d) => {
      val dir = s"/root/repo/target/fixtures/${new java.io.File(d).getName}/jsonl"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
        .write.json(dir)
      s.read.schema("doc_id LONG, lang STRING, n_chars LONG, text STRING")
        .json(dir)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text")).as("text_md5"))
    }),

    // S18: WET (WARC conversion) round-trip — the Common Crawl
    // interchange format web curation starts from (CCNet/RefinedWeb
    // stage 0). A documents slice is serialized as 4 deterministic WET
    // shards (warcinfo + conversion records, CRLF headers, payloads
    // sliced by Content-Length — the s16 tar discipline applied to the
    // crawl format), read back through the per-file record walk, and
    // hashed. URL, WARC-Date, and text all survive the oracle hash, so
    // the writer's wire format AND the reader's boundary parse are both
    // on the hook; gzip/member handling and the text-contains-"WARC/1.0"
    // boundary case are WetSpec's.
    "s18_wet_roundtrip" -> ((s, d) => {
      val dir = s"/root/repo/target/fixtures/${new java.io.File(d).getName}/wet"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.sources.Wet.writeWetShards(
        t(s, d, "documents").filter(col("doc_id") < 200)
          .select(concat(lit("https://example.com/doc/"),
              col("doc_id").cast("string")).as("url"),
            expr("timestampadd(SECOND, CAST(doc_id AS INT), " +
              "TIMESTAMP'2024-01-01 00:00:00')").as("ts"),
            col("text")),
        "url", "ts", "text", dir, numShards = 4)
      graft.sources.Wet.readWet(s, dir)
        .select(col("url"), col("record_ts"),
          length(col("text")).cast("long").as("n_chars_txt"),
          md5(col("text")).as("text_md5"))
    }),

    // S19: raw-crawl WARC `response` round-trip — the step BEFORE WET in
    // a RefinedWeb-class pipeline (the engine previously stopped one
    // format short of the raw crawl, r15 verdict missing #1). A documents
    // slice becomes HTML pages in 4 deterministic WARC shards; half the
    // records declare the charset in the HTTP Content-Type header, half
    // carry only an HTML <meta charset> tag (NULL charset column), so
    // BOTH sniff paths are pinned by the oracle: content_type proves
    // which header was written, charset proves the sniff converged, and
    // the html md5 proves the HTTP-envelope parse + decode returned the
    // exact page. Non-UTF-8 decode (ISO-8859-1, windows-1252, BOM,
    // chunked/gzip transfer) is WetSpec's — DuckDB cannot re-encode
    // legacy charsets, so the oracle pins the UTF-8 wire while the spec
    // pins the byte-level sniffer.
    "s19_warc_roundtrip" -> ((s, d) => {
      val dir = s"/root/repo/target/fixtures/${new java.io.File(d).getName}/warc"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.sources.Wet.writeWarcShards(
        t(s, d, "documents").filter(col("doc_id") < 200)
          .select(concat(lit("https://example.com/page/"),
              col("doc_id").cast("string")).as("url"),
            expr("timestampadd(SECOND, CAST(doc_id AS INT), " +
              "TIMESTAMP'2024-01-01 00:00:00')").as("ts"),
            concat(
              lit("<html><head><meta charset=\"utf-8\"/></head><body><p>"),
              col("text"), lit("</p></body></html>")).as("html"),
            when(col("doc_id") % 2 === 0, lit("utf-8")).as("cs")),
        "url", "ts", "html", Some("cs"), dir, numShards = 4)
      graft.sources.Wet.readWarc(s, dir)
        .select(col("url"), col("record_ts"), col("http_status"),
          col("content_type"), col("charset"),
          md5(col("html")).as("html_md5"))
    }),

    // S19b: BINARY WARC response round-trip — a raw crawl carries
    // images/audio/PDFs alongside HTML, and charset-decoding those
    // corrupts them; readWarcBinary returns the HTTP body as raw bytes
    // that drop straight into the multimodal family (u1 magic sniff,
    // dHash, perceptual banding). Bodies here are deterministic 16-byte
    // blobs (unhex of the text md5) so DuckDB can rebuild them; the hex
    // of the bytes survives the oracle hash, pinning the HTTP envelope
    // parse + the fact that NO charset decode touched the payload.
    "s19b_warc_binary" -> ((s, d) => {
      val dir = s"/root/repo/target/fixtures/${new java.io.File(d).getName}/warcbin"
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.sources.Wet.writeWarcBinaryShards(
        t(s, d, "documents").filter(col("doc_id") < 200)
          .select(concat(lit("https://img.example/"),
              col("doc_id").cast("string")).as("url"),
            expr("timestampadd(SECOND, CAST(doc_id AS INT), " +
              "TIMESTAMP'2024-01-01 00:00:00')").as("ts"),
            unhex(md5(col("text"))).as("body"),
            lit("image/png").as("ct")),
        "url", "ts", "body", "ct", dir, numShards = 4)
      graft.sources.Wet.readWarcBinary(s, dir)
        .select(col("url"), col("record_ts"), col("http_status"),
          col("content_type"),
          length(col("content")).cast("long").as("n_bytes"),
          hex(col("content")).as("body_hex"))
    }),

    // J2 (pairsJoin form): the dead-code-no-more fan-out — pairs rows
    // left-joined to per-directory asset manifests through
    // ManifestOps.pairsJoin (person dir + garment dir).
    "j2b_pairs_fanout" -> ((s, d) => {
      val pairs = t(s, d, "orders").filter(col("o_orderkey") % 10 === 0)
        .select(col("o_custkey").as("person_id"),
          (col("o_orderkey") % 100 + 1).as("garment_id"))
      val assets = t(s, d, "customer")
        .select(lit("person").as("dir"), col("c_custkey").as("id"), col("c_name").as("key"))
        .unionByName(t(s, d, "part")
          .select(lit("garment").as("dir"), col("p_partkey").as("id"), col("p_name").as("key")))
      ManifestOps.pairsJoin(pairs, assets, Seq("person"), Seq("garment"))
        .select(col("person_id"), col("garment_id"),
          col("person_key"), col("garment_key"))
    }),

    // S9: sync manifest diff — remote manifest minus already-local keys =
    // the pending-transfer set, with sizes for scheduling
    // (reference checkpoints/download.py:37-66). The transfer itself is
    // Pipelines.sync (foreachPartition; exercised in PipelinesSpec).
    "s9_sync_diff" -> ((s, d) => {
      val remote = t(s, d, "supplier")
        .select(col("s_suppkey").as("key"), col("s_acctbal").as("size"))
      val local = remote.filter(col("key") % 3 === 0)
      remote.join(local.select("key"), Seq("key"), "left_anti")
    }),

    // S12: compaction plan — the small-files maintenance pass: within each
    // table partition (nation ≙ partition dir), walk the file manifest in
    // key order accumulating sizes and cut a new compaction group whenever
    // the running total crosses the target. Windows are PER PARTITION
    // (parallelism = #partitions, never a global cumsum), and the greedy
    // first-fit is deterministic in the manifest order. Output: one row
    // per planned output file with its input count and bytes.
    "s12_compaction_plan" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s_nationkey")).orderBy(col("s_suppkey"))
      t(s, d, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"),
          col("s_acctbal").cast("double").as("size"))
        // group = how many FULL targets fit strictly before this file's
        // interval starts -> first-fit bins of ~target bytes
        .withColumn("grp", floor((sum(col("size")).over(w) - col("size")) /
          lit(50000.0)).cast("long"))
        .groupBy(col("s_nationkey"), col("grp"))
        .agg(count(lit(1)).as("n_files"),
          round(sum(col("size")), 2).as("group_bytes"))
    }),

    // S13: hive-partitioned layout + directory pruning — orders written
    // once per scale factor as dir/o_orderpriority=…/part-*.parquet, read
    // back with a partition-column filter: the non-matching directories
    // are pruned at planning time (PartitionFilters — asserted in
    // PlanAuditSpec), so the scan lists one partition's files out of five.
    // The fixture is cached on disk (content is a pure function of the SF
    // dir), so repeat invocations — Bench's timed passes in particular —
    // measure the pruned READ, not the write. The oracle recomputes the
    // same aggregate from the orders table.
    "s13_partition_prune" -> ((s, d) => {
      val dir = s"/root/repo/target/fixtures/${new java.io.File(d).getName}/orders_part"
      val marker = new org.apache.hadoop.fs.Path(dir + "/_SUCCESS")
      if (!marker.getFileSystem(s.sparkContext.hadoopConfiguration).exists(marker))
        graft.ops.Layout.writePartitioned(
          t(s, d, "orders")
            .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")),
          dir, "o_orderpriority")
      s.read.parquet(dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // S14: schema evolution across write epochs — v1 files lack a column
    // that v2 files added; `mergeSchema` unifies the footers at read time
    // and back-fills nulls for the missing column, so an aggregate over
    // the evolved column groups v1 rows under NULL. The long-lived-lake
    // reality: readers must tolerate additive schema drift without
    // rewriting 100 TB of history. Explicit subdir paths (not key=value
    // names) so no partition column is inferred.
    "s14_schema_evolution" -> ((s, d) => {
      val dir = s"/root/repo/target/fixtures/${new java.io.File(d).getName}/evolved"
      // fixture cached on disk like s13: deterministic per SF dir, so the
      // benched/repeat path measures the mergeSchema READ, not the writes
      val marker = new org.apache.hadoop.fs.Path(dir + "/v2/_SUCCESS")
      if (!marker.getFileSystem(s.sparkContext.hadoopConfiguration).exists(marker)) {
        val orders = t(s, d, "orders")
        orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(dir + "/v1")
        orders.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
          .write.mode("overwrite").parquet(dir + "/v2")
      }
      s.read.option("mergeSchema", "true").parquet(dir + "/v1", dir + "/v2")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    // S15: versioned-snapshot read (time-travel-lite) — the s11 MERGE
    // chain persisted as append-only epoch partitions (_v=0 base, _v=1
    // keyed refresh, _v=2 refresh + deletes) and read back AS OF two
    // different versions in one result. readAsOf prunes epochs by
    // partition (_v <= V never touches later directories) and resolves
    // last-writer-wins with a map-side max_by aggregate — one shuffle.
    // The oracle replays the same chain arithmetically from orders.
    // asOf(1) must NOT see epoch 2's tripled prices or deletes even
    // though both are on disk — that's the time-travel property under
    // test.
    "s15_snapshot_asof" -> ((s, d) => {
      import graft.ops.Snapshots
      // spec tag in the fixture path: the cached chain is only valid for
      // THIS epoch definition — bump the tag whenever the filters /
      // multipliers / delete predicate below change, or a stale cached
      // chain would silently mismatch the recomputed oracle
      val spec = "e0-3rd_e1-2x2_e2-3x5del7"
      val dir =
        s"/root/repo/target/fixtures/${new java.io.File(d).getName}/snapshots_$spec"
      val marker = new org.apache.hadoop.fs.Path(dir + "/_v=2/_SUCCESS")
      if (!marker.getFileSystem(s.sparkContext.hadoopConfiguration).exists(marker)) {
        val orders = t(s, d, "orders")
        Snapshots.writeEpoch(orders.filter(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice").as("price"),
            col("o_orderpriority").as("priority"), lit(false).as("_deleted")),
          dir, 0)
        Snapshots.writeEpoch(orders.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), (col("o_totalprice") * 2).as("price"),
            col("o_orderpriority").as("priority"), lit(false).as("_deleted")),
          dir, 1)
        Snapshots.writeEpoch(orders.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), (col("o_totalprice") * 3).as("price"),
            col("o_orderpriority").as("priority"),
            (col("o_orderkey") % 7 === 0).as("_deleted")),
          dir, 2)
      }
      val v1 = Snapshots.readAsOf(s, dir, Seq("o_orderkey"), 1)
        .withColumn("version", lit(1))
      val v2 = Snapshots.readAsOf(s, dir, Seq("o_orderkey"), 2)
        .withColumn("version", lit(2))
      v1.unionByName(v2)
        .select(col("version"), col("o_orderkey"), col("price"), col("priority"))
    }),

    // S11: keyed upsert / merge — the incremental-manifest-refresh shape
    // (MERGE INTO semantics as one full-outer join + coalesce: updates
    // win on matched keys, unmatched base rows persist, brand-new keys
    // insert). Base = orders outside the % 3 slice; updates = the % 2
    // slice with a recomputed price. One shuffle on the key; both margins
    // survive.
    "s11_upsert" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val base = orders.filter(col("o_orderkey") % 3 =!= 0)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      val updates = orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          col("o_orderpriority"))
      base.as("b").join(updates.as("u"), Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          coalesce(col("u.o_totalprice"), col("b.o_totalprice")).as("price"),
          coalesce(col("u.o_orderpriority"), col("b.o_orderpriority")).as("priority"),
          when(col("u.o_totalprice").isNotNull && col("b.o_totalprice").isNotNull, "updated")
            .when(col("u.o_totalprice").isNotNull, "inserted")
            .otherwise("kept").as("action"))
    }))

  def oracle: Map[String, String] = Map(
    "s5_pairs_csv" ->
      """SELECT person_id, garment_id, c_name
         FROM read_csv('/root/repo/target/fixtures/pairs_csv/*.csv',
                       delim=' ', header=false,
                       columns={'person_id': 'BIGINT', 'garment_id': 'BIGINT'})
         JOIN customer ON person_id = c_custkey""",
    "s18_wet_roundtrip" ->
      """SELECT 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
                TIMESTAMP '2024-01-01 00:00:00'
                  + to_seconds(CAST(doc_id AS BIGINT)) AS record_ts,
                CAST(length(text) AS BIGINT) AS n_chars_txt,
                md5(text) AS text_md5
         FROM documents WHERE doc_id < 200""",
    "s17_jsonl_roundtrip" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
         FROM documents WHERE doc_id < 200""",
    "s19_warc_roundtrip" ->
      """SELECT 'https://example.com/page/' || CAST(doc_id AS VARCHAR) AS url,
                TIMESTAMP '2024-01-01 00:00:00'
                  + to_seconds(CAST(doc_id AS BIGINT)) AS record_ts,
                200 AS http_status,
                CASE WHEN doc_id % 2 = 0 THEN 'text/html; charset=utf-8'
                     ELSE 'text/html' END AS content_type,
                'UTF-8' AS charset,
                md5('<html><head><meta charset="utf-8"/></head><body><p>'
                    || text || '</p></body></html>') AS html_md5
         FROM documents WHERE doc_id < 200""",
    "s19b_warc_binary" ->
      """SELECT 'https://img.example/' || CAST(doc_id AS VARCHAR) AS url,
                TIMESTAMP '2024-01-01 00:00:00'
                  + to_seconds(CAST(doc_id AS BIGINT)) AS record_ts,
                200 AS http_status,
                'image/png' AS content_type,
                CAST(16 AS BIGINT) AS n_bytes,
                upper(md5(text)) AS body_hex
         FROM documents WHERE doc_id < 200""",
    "j2b_pairs_fanout" ->
      """WITH pairs AS (
           SELECT o_custkey AS person_id, o_orderkey % 100 + 1 AS garment_id
           FROM orders WHERE o_orderkey % 10 = 0)
         SELECT person_id, garment_id, c.c_name AS person_key, p.p_name AS garment_key
         FROM pairs
         LEFT JOIN customer c ON person_id = c.c_custkey
         LEFT JOIN part p ON garment_id = p.p_partkey""",
    "s9_sync_diff" ->
      """SELECT s_suppkey AS key, s_acctbal AS size FROM supplier
         WHERE s_suppkey % 3 != 0""",
    "s14_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END AS o_orderpriority,
                count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY 1""",
    "s13_partition_prune" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
                round(sum(o_totalprice), 2) AS sum_price
         FROM orders WHERE o_orderpriority = '1-URGENT'
         GROUP BY o_orderpriority""",
    "s12_compaction_plan" ->
      """WITH f AS (SELECT s_nationkey, s_suppkey, CAST(s_acctbal AS DOUBLE) AS size
                    FROM supplier),
              c AS (SELECT *, CAST(floor((sum(size) OVER (PARTITION BY s_nationkey
                      ORDER BY s_suppkey ROWS UNBOUNDED PRECEDING) - size)
                      / 50000.0) AS BIGINT) AS grp
                    FROM f)
         SELECT s_nationkey, grp, count(*) AS n_files,
                round(sum(size), 2) AS group_bytes
         FROM c GROUP BY s_nationkey, grp""",
    "s15_snapshot_asof" ->
      """WITH v1 AS (SELECT o_orderkey,
                CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS price,
                o_orderpriority AS priority
              FROM orders
              WHERE o_orderkey % 3 != 0 OR o_orderkey % 2 = 0),
              v2 AS (SELECT o_orderkey,
                CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 3
                     WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS price,
                o_orderpriority AS priority
              FROM orders
              WHERE (o_orderkey % 3 != 0 OR o_orderkey % 2 = 0
                     OR o_orderkey % 5 = 0)
                AND NOT (o_orderkey % 5 = 0 AND o_orderkey % 7 = 0))
         SELECT CAST(1 AS INT) AS version, * FROM v1
         UNION ALL
         SELECT CAST(2 AS INT) AS version, * FROM v2""",
    "s11_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice, o_orderpriority
                       FROM orders WHERE o_orderkey % 3 != 0),
              upd AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
                             o_orderpriority
                      FROM orders WHERE o_orderkey % 2 = 0)
         SELECT coalesce(b.o_orderkey, u.o_orderkey) AS o_orderkey,
                coalesce(u.o_totalprice, b.o_totalprice) AS price,
                coalesce(u.o_orderpriority, b.o_orderpriority) AS priority,
                CASE WHEN u.o_totalprice IS NOT NULL AND b.o_totalprice IS NOT NULL
                       THEN 'updated'
                     WHEN u.o_totalprice IS NOT NULL THEN 'inserted'
                     ELSE 'kept' END AS action
         FROM base b FULL JOIN upd u ON b.o_orderkey = u.o_orderkey""")
}
