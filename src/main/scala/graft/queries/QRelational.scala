package graft.queries

import graft.core.Tables
import graft.ops.Stats
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan / projection / join / aggregation queries (SURVEY §2.1-2.4) over the
  * oracle tables. Query ids reference SURVEY §2 operator rows.
  */
object QRelational {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: projected + filtered scan; filter and column pruning reach parquet.
    "s1_scan" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45.0)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))),

    // S2: regex (extension-style) filter embedded in the scan.
    "s2_rlike_filter" -> ((s, d) =>
      t(s, d, "part")
        .filter(col("p_name").rlike("(?i)(widget|bolt)$"))
        .select(col("p_partkey"), col("p_name"))),

    // S3: multi-source scan + unionByName (multi-prefix union).
    "s3_union_scan" -> ((s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("src"))
        .unionByName(t(s, d, "supplier")
          .select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("supplier").as("src")))),

    // S7: JSON serialization of a struct (metrics-sink shape).
    "s7_to_json" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey"),
        to_json(struct(col("n_nationkey").as("key"), col("n_name").as("name"))).as("js"))),

    // P1: stem extraction by regex (reference train/common/dataset.py:229-253).
    "p1_stem" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        regexp_extract(col("c_name"), "#(\\d+)", 1).as("stem"),
        split(col("c_name"), "#").getItem(0).as("prefix"))),

    // P2: difficulty-style CASE classification (train/common/dataset.py:166-178).
    "p2_difficulty" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
        when(col("o_orderpriority").startsWith("1-"), "hard")
          .when(col("o_orderpriority").startsWith("2-"), "medium")
          .otherwise("easy").as("difficulty"))),

    // P3: complete-triplet predicate — groups holding all 3 roles.
    "p3_complete_groups" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_linenumber") % 3).as("n_roles"),
          count(lit(1)).as("n_lines"))
        .filter(col("n_roles") === 3)),

    // P6/P7: alias coalescing + null drop (train_CATVTON/train.py:147-148).
    "p6_coalesce" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("DEFAULT")).as("segment"))),
    "p7_null_drop" -> ((s, d) =>
      t(s, d, "customer")
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
        .filter(col("seg").isNotNull)
        .select(col("c_custkey"), col("seg"))),

    // P4: partition-split filter — keep lines ending " test"
    // (reference DATASET_STRUCTURES.md:165-183 list_eval_partition shape).
    "p4_split_filter" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("line", concat(col("o_orderpriority"),
          when(col("o_orderkey") % 4 === 0, " test").otherwise(" train")))
        .filter(col("line").endsWith(" test"))
        .select(col("o_orderkey"), col("line"))),

    // P5: view-routing conditional — front view → person, else cloth
    // (reference DATASET_STRUCTURES.md:170-183).
    "p5_view_routing" -> ((s, d) =>
      t(s, d, "part").select(col("p_partkey"),
        when(lower(col("p_type")).contains("standard"), "person")
          .otherwise("cloth").as("role"))),

    // P9: constant projection (caption/default-label placeholders,
    // reference train/train_stage_1/dataloader.py:71).
    "p9_const" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        lit("a photo of a synthetic object").as("caption"),
        lit(0).as("label"))),

    // P8: path parsing — synthesize s3 keys then parse back.
    "p8_path_parse" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        concat(lit("s3://graft/"), col("source"), lit("/"),
          col("doc_id").cast("string"), lit(".txt")).as("uri"))
        .select(col("doc_id"), col("uri"),
          regexp_extract(col("uri"), "^s3://([^/]+)/", 1).as("bucket"),
          regexp_extract(col("uri"), "([^/]+)$", 1).as("base"))),

    // J1: triplet discovery as a 3-way equi-join on the group key, with the
    // reference's last-write-wins representative (max per role).
    "j1_triplet_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def role(r: Int, alias: String) = li
        .filter(col("l_linenumber") % 3 === r)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_partkey")).as(alias))
      role(0, "r0").join(role(1, "r1"), "l_orderkey").join(role(2, "r2"), "l_orderkey")
    }),

    // J4: incomplete groups — left-anti of all keys vs complete keys.
    "j4_anti_incomplete" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val complete = li.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_linenumber") % 3).as("nr"))
        .filter(col("nr") === 3)
        .select("l_orderkey")
      li.select("l_orderkey").distinct()
        .join(complete, Seq("l_orderkey"), "left_anti")
    }),

    // J2: multi-hop equi-join fan-out (pairs-file shape).
    "j2_pairs_join" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .select(col("o_orderkey"), col("c_name"), col("n_name"))),

    // J3: left-semi — customers that have orders (prediction∩GT skip).
    "j3_semi" -> ((s, d) =>
      t(s, d, "customer").join(
        t(s, d, "orders").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),

    // J5: theta join (equi + non-equi residual).
    "j5_theta" -> ((s, d) =>
      t(s, d, "part").join(t(s, d, "lineitem"),
        col("p_partkey") === col("l_partkey") && col("l_quantity") > col("p_size"))
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_over"), round(sum(col("l_quantity")), 4).as("qty_over"))),

    // J6: broadcast-hint join of a small dimension.
    "j6_broadcast" -> ((s, d) =>
      t(s, d, "customer").join(broadcast(t(s, d, "nation")),
        col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))),

    // J7: range join — lineitems shipped within 90 days of their order date.
    // The window end is pre-projected (date_add) so the join condition is a
    // pure equi-key + residual column comparison: Catalyst plans a hash/SMJ
    // join on l_orderkey with the date bounds as a cheap post-join filter,
    // never a range-join or nested-loop plan.
    "j7_range_join" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"),
          date_add(col("o_orderdate"), 90).as("o_end"))
      o.join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_end"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_in_window"))
    }),

    // J8: cross join (small × small).
    "j8_cross" -> ((s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select(col("r_name"), col("n_name"))),

    // A1: stats pack — mean/std_pop/min/max (train/common/metrics.py:453-462).
    "a1_stats_pack" -> ((s, d) =>
      Stats.statsPack(t(s, d, "lineitem"), Seq("l_returnflag"), col("l_extendedprice"))),

    // A1b: bivariate stats — correlation and covariance between price
    // columns per group (the metric-vs-metric relationship pass an
    // evaluation harness runs over per-sample scores).
    "a1b_corr" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covar_pop"))),

    // A13: exact interpolated percentiles (p50/p90/p99) per group — the
    // latency/score distribution summary; exact, not the HLL-style sketch
    // (a11 covers approximate). Window-sort form, not the built-in
    // `percentile` aggregate: that one holds an unspillable per-group
    // value->count map (OOM at high cardinality); see Stats.exactPercentiles.
    "a13_percentiles" -> ((s, d) =>
      Stats.exactPercentiles(t(s, d, "lineitem"), Seq("l_returnflag"),
        col("l_extendedprice"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))),

    // A2: group-count by stratum (train/common/dataset.py:161-164).
    "a2_group_count" -> ((s, d) =>
      t(s, d, "orders").groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))),

    // A3: grouped ordered collect (triplet-assembly alternative). The
    // collected list is serialized to a comma-joined string so the driver
    // comparator (which sorts/hashes scalar cells) can verify it; sorting
    // happens on the ints BEFORE stringification to keep numeric order.
    "a3_grouped_collect" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(array_join(transform(sort_array(collect_list(col("l_linenumber"))),
          x => x.cast("string")), ",").as("lines"))),

    // A4: mean-IoU shape (train/common/metrics.py:223-248).
    "a4_miou" -> ((s, d) =>
      Stats.meanIoU(t(s, d, "lineitem"), col("l_linenumber"),
        when(col("l_quantity") < 25, 1).otherwise(0),
        when(col("l_quantity") < 50, 1).otherwise(0))),

    // A5: PCK threshold fraction (train/common/metrics.py:250-268).
    "a5_pck" -> ((s, d) =>
      Stats.thresholdFraction(t(s, d, "lineitem"), Seq("l_returnflag"),
        col("l_discount"), 0.05)),

    // A6: loss-style reduction (MSE between derived columns).
    "a6_loss_mse" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_linestatus"))
        .agg(round(avg(pow(col("l_extendedprice") / 1000.0 - col("l_quantity"), 2)), 4).as("mse"),
          round(avg(abs(col("l_extendedprice") / 1000.0 - col("l_quantity"))), 4).as("mae"))),

    // A8: dataset count/size report (len(dataset) / len(dataloader) shape,
    // reference train/common/dataset.py:161, common/examples.py:108).
    "a8_counts" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        (ceil(count(lit(1)) / 32.0)).cast("long").as("n_batches_32"))),

    // A9: distinct + exact distinct count.
    "a9_distinct" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"))),

    // A11: approximate distinct (HLL) — engine-specific, rows-only check.
    "a11_approx_distinct" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))),

    // A11b: the QUANTITATIVE gate for the sketch a11 can only rows-check.
    // approx_count_distinct's default rsd is 0.05; the estimate must land
    // within a conservative 3×rsd (15%) of the exact distinct count. The
    // oracle cannot reproduce the HLL register values — but it CAN assert
    // the error bound: the output carries the exact count plus a boolean
    // the oracle pins to TRUE, so a drifting/broken sketch flips the
    // column and hash-fails instead of passing a weaker rows-only check.
    "a11b_approx_error" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("__approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("__approx") - col("exact_parts")) <=
            ceil(col("exact_parts") * lit(0.15))).as("within_bound"))),

    // A10: rollup summary matrix (evaluate_all_models.py:56-116 shape).
    "a10_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))),

    // A10b: full cube — all four grouping sets of the summary matrix
    // (model×benchmark grid with both margins, evaluate_all_models.py
    // shape) in one pass.
    "a10b_cube" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))),

    // A10c: explicit GROUPING SETS — an asymmetric set list neither rollup
    // nor cube expresses ((priority,status), (status), ()); grouping_id
    // disambiguates a real NULL group value from a rolled-up margin.
    "a10c_grouping_sets" -> ((s, d) =>
      t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          grouping_id().cast("long").as("gid"))),

    // A12: pivoted wide table (evaluate_all_models.py:106-116).
    "a12_pivot" -> ((s, d) =>
      Stats.pivotCount(
        t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey")),
        "n_name", "o_orderstatus", Seq("O", "F", "P"))),

    // F5: map/struct family — struct make + dot access, map literal +
    // element_at lookup (reference nested stats structs,
    // train/common/metrics.py:455-462).
    "f5_map_struct" -> ((s, d) => {
      val statusNames = map(
        lit("O"), lit("open"), lit("F"), lit("finished"), lit("P"), lit("partial"))
      t(s, d, "orders")
        .select(col("o_orderkey"),
          struct(col("o_orderstatus").as("st"), col("o_totalprice").as("tp")).as("rec"),
          statusNames.as("names"))
        .select(col("o_orderkey"),
          col("rec.st").as("status"),
          round(col("rec.tp") * 2, 4).as("double_price"),
          element_at(col("names"), col("rec.st")).as("status_name"))
    }),

    // U6: triplet explode — the generator direction of J1: one complete
    // triplet row fans out to three (role, key) asset rows.
    "u6_triplet_explode" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def role(r: Int, alias: String) = li
        .filter(col("l_linenumber") % 3 === r)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_partkey")).as(alias))
      role(0, "r0").join(role(1, "r1"), "l_orderkey").join(role(2, "r2"), "l_orderkey")
        .select(col("l_orderkey"), explode(array(
          struct(lit("r0").as("role"), col("r0").as("partkey")),
          struct(lit("r1").as("role"), col("r1").as("partkey")),
          struct(lit("r2").as("role"), col("r2").as("partkey")))).as("x"))
        .select(col("l_orderkey"), col("x.role").as("role"), col("x.partkey").as("partkey"))
    }),

    // X4: mixture union with category-prefixed ids (train_mixture shape).
    "x4_union_mixture" -> ((s, d) =>
      t(s, d, "documents")
        .select(concat(col("source"), lit("_"), col("doc_id").cast("string")).as("mix_id"),
          col("lang"), col("n_chars"))),

    // X5: intersect / except on key sets.
    "x5_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .intersect(t(s, d, "orders").select(col("o_custkey").as("k")))),
    "x5_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").select(col("o_custkey").as("k")))))

  def oracle: Map[String, String] = Map(
    "s1_scan" ->
      "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_quantity > 45.0",
    "s2_rlike_filter" ->
      "SELECT p_partkey, p_name FROM part WHERE regexp_matches(p_name, '(?i)(widget|bolt)$')",
    "s3_union_scan" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS src FROM customer
         UNION ALL
         SELECT s_suppkey AS id, s_name AS name, 'supplier' AS src FROM supplier""",
    "s7_to_json" ->
      "SELECT n_nationkey, CAST(to_json(struct_pack(key := n_nationkey, name := n_name)) AS VARCHAR) AS js FROM nation",
    "p1_stem" ->
      """SELECT c_custkey, regexp_extract(c_name, '#(\d+)', 1) AS stem,
                string_split(c_name, '#')[1] AS prefix FROM customer""",
    "p2_difficulty" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderpriority LIKE '1-%' THEN 'hard'
                     WHEN o_orderpriority LIKE '2-%' THEN 'medium'
                     ELSE 'easy' END AS difficulty FROM orders""",
    "p3_complete_groups" ->
      """SELECT l_orderkey, CAST(count(DISTINCT l_linenumber % 3) AS BIGINT) AS n_roles,
                count(*) AS n_lines
         FROM lineitem GROUP BY l_orderkey HAVING count(DISTINCT l_linenumber % 3) = 3""",
    "p6_coalesce" ->
      "SELECT c_custkey, coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS segment FROM customer",
    "p7_null_drop" ->
      "SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg FROM customer WHERE nullif(c_mktsegment, 'BUILDING') IS NOT NULL",
    "p4_split_filter" ->
      """SELECT o_orderkey,
                o_orderpriority || (CASE WHEN o_orderkey % 4 = 0 THEN ' test' ELSE ' train' END) AS line
         FROM orders WHERE o_orderkey % 4 = 0""",
    "p5_view_routing" ->
      """SELECT p_partkey,
                CASE WHEN contains(lower(p_type), 'standard') THEN 'person'
                     ELSE 'cloth' END AS role
         FROM part""",
    "p9_const" ->
      """SELECT doc_id, 'a photo of a synthetic object' AS caption,
                CAST(0 AS INT) AS label
         FROM documents""",
    "f5_map_struct" ->
      """SELECT o_orderkey, o_orderstatus AS status,
                round(o_totalprice * 2, 4) AS double_price,
                CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
                     WHEN 'P' THEN 'partial' END AS status_name
         FROM orders""",
    "u6_triplet_explode" ->
      """WITH r0 AS (SELECT l_orderkey, max(l_partkey) AS k FROM lineitem WHERE l_linenumber % 3 = 0 GROUP BY l_orderkey),
              r1 AS (SELECT l_orderkey, max(l_partkey) AS k FROM lineitem WHERE l_linenumber % 3 = 1 GROUP BY l_orderkey),
              r2 AS (SELECT l_orderkey, max(l_partkey) AS k FROM lineitem WHERE l_linenumber % 3 = 2 GROUP BY l_orderkey),
              j AS (SELECT r0.l_orderkey, r0.k AS r0, r1.k AS r1, r2.k AS r2
                    FROM r0 JOIN r1 USING (l_orderkey) JOIN r2 USING (l_orderkey))
         SELECT l_orderkey, 'r0' AS role, r0 AS partkey FROM j
         UNION ALL SELECT l_orderkey, 'r1', r1 FROM j
         UNION ALL SELECT l_orderkey, 'r2', r2 FROM j""",
    "p8_path_parse" ->
      """SELECT doc_id,
                's3://graft/' || source || '/' || CAST(doc_id AS VARCHAR) || '.txt' AS uri,
                regexp_extract('s3://graft/' || source || '/' || CAST(doc_id AS VARCHAR) || '.txt', '^s3://([^/]+)/', 1) AS bucket,
                regexp_extract('s3://graft/' || source || '/' || CAST(doc_id AS VARCHAR) || '.txt', '([^/]+)$', 1) AS base
         FROM documents""",
    "j1_triplet_join" ->
      """WITH r0 AS (SELECT l_orderkey, max(l_partkey) AS r0 FROM lineitem WHERE l_linenumber % 3 = 0 GROUP BY l_orderkey),
              r1 AS (SELECT l_orderkey, max(l_partkey) AS r1 FROM lineitem WHERE l_linenumber % 3 = 1 GROUP BY l_orderkey),
              r2 AS (SELECT l_orderkey, max(l_partkey) AS r2 FROM lineitem WHERE l_linenumber % 3 = 2 GROUP BY l_orderkey)
         SELECT l_orderkey, r0.r0 AS r0, r1.r1 AS r1, r2.r2 AS r2
         FROM r0 JOIN r1 USING (l_orderkey) JOIN r2 USING (l_orderkey)""",
    "j4_anti_incomplete" ->
      """SELECT DISTINCT l_orderkey FROM lineitem
         WHERE l_orderkey NOT IN (
           SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
           HAVING count(DISTINCT l_linenumber % 3) = 3)""",
    "j2_pairs_join" ->
      """SELECT o_orderkey, c_name, n_name FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey""",
    "j3_semi" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
    "j5_theta" ->
      """SELECT p_partkey, count(*) AS n_over, round(sum(l_quantity), 4) AS qty_over
         FROM part JOIN lineitem ON p_partkey = l_partkey AND l_quantity > p_size
         GROUP BY p_partkey""",
    "j6_broadcast" ->
      "SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey",
    "j7_range_join" ->
      """SELECT o_orderkey, count(*) AS n_in_window
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
         GROUP BY o_orderkey""",
    "j8_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "a1_stats_pack" ->
      """SELECT l_returnflag, round(avg(l_extendedprice), 4) AS mean,
                round(stddev_pop(l_extendedprice), 4) AS std,
                min(l_extendedprice) AS min, max(l_extendedprice) AS max
         FROM lineitem GROUP BY l_returnflag""",
    "a1b_corr" ->
      """SELECT l_returnflag, round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
                round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_pop
         FROM lineitem GROUP BY l_returnflag""",
    "a13_percentiles" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
                round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
         FROM lineitem GROUP BY l_returnflag""",
    "a2_group_count" ->
      "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority",
    "a3_grouped_collect" ->
      "SELECT l_orderkey, string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines FROM lineitem GROUP BY l_orderkey",
    "a4_miou" ->
      """WITH per_class AS (
           SELECT l_linenumber AS class,
                  CAST(sum(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END) AS BIGINT) AS i,
                  CAST(sum(CASE WHEN l_quantity < 50 THEN 1 ELSE 0 END) AS BIGINT) AS u
           FROM lineitem GROUP BY l_linenumber)
         SELECT round(avg(i / u), 6) AS miou FROM per_class WHERE u > 0""",
    "a5_pck" ->
      """SELECT l_returnflag, round(avg(CASE WHEN l_discount < 0.05 THEN 1.0 ELSE 0.0 END), 6) AS frac_under
         FROM lineitem GROUP BY l_returnflag""",
    "a6_loss_mse" ->
      """SELECT l_linestatus,
                round(avg(power(l_extendedprice / 1000.0 - l_quantity, 2)), 4) AS mse,
                round(avg(abs(l_extendedprice / 1000.0 - l_quantity)), 4) AS mae
         FROM lineitem GROUP BY l_linestatus""",
    "a8_counts" ->
      """SELECT count(*) AS n_rows,
                CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                CAST(ceil(count(*) / 32.0) AS BIGINT) AS n_batches_32
         FROM lineitem""",
    "a9_distinct" ->
      "SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts FROM lineitem GROUP BY l_returnflag",
    // a11b: the oracle pins the HLL error-bound boolean — it cannot
    // reproduce the sketch, but it CAN demand the estimate lands within
    // 3×rsd of the exact count (the engine computes the comparison; a
    // drifting sketch flips the column and hash-fails).
    "a11b_approx_error" ->
      """SELECT l_returnflag,
                CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
                TRUE AS within_bound
         FROM lineitem GROUP BY l_returnflag""",
    "a10_rollup" ->
      """SELECT n_name, o_orderstatus, count(*) AS cnt
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, o_orderstatus)""",
    "a10b_cube" ->
      """SELECT n_name, o_orderstatus, count(*) AS cnt
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY CUBE (n_name, o_orderstatus)""",
    "a10c_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
                CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid
         FROM orders
         GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                 (o_orderstatus), ())""",
    "a12_pivot" ->
      """SELECT n_name,
                count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
                count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
                count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "x4_union_mixture" ->
      "SELECT source || '_' || CAST(doc_id AS VARCHAR) AS mix_id, lang, n_chars FROM documents",
    "x5_intersect" ->
      "SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders",
    "x5_except" ->
      "SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders")
}
