package graft.queries

import graft.core.Tables
import graft.ann.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function catalog queries (SURVEY §2.7: string / date / math /
  * array / json families). Every function is a codegen'd Catalyst built-in.
  */
object QScalars {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: string family.
    "f1_string" -> ((s, d) =>
      t(s, d, "customer").select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lower"),
        regexp_extract(col("c_name"), "#(\\d+)", 1).as("name_num"),
        substring(col("c_mktsegment"), 1, 3).as("seg3"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("joined"),
        length(col("c_name")).as("nlen"),
        col("c_name").startsWith("Customer#0000000").as("starts"),
        regexp_replace(col("c_mktsegment"), "E", "3").as("rep"))),

    // F2: date/time family.
    "f2_datetime" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("mstart"),
        datediff(lit("2026-01-01").cast("date"), col("o_orderdate")).as("age_days"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))),

    // F3: math family.
    "f3_math" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(pow(col("l_discount") + 1.0, 3), 6).as("pw"),
        abs(col("l_quantity") - 25.0).as("ab"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        least(col("l_quantity"), col("l_extendedprice") / 1000.0).as("ls"),
        greatest(col("l_tax"), col("l_discount")).as("gr"),
        round(log(col("l_extendedprice")), 6).as("ln_p"),
        (col("l_orderkey") % 7).as("mod7"))),

    // F4: array higher-order functions over the embedding column.
    "f4_array_hof" -> ((s, d) => {
      val v = Vectors.asDouble(col("embedding"))
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dims"),
        round(Vectors.l2norm(v), 6).as("norm"),
        round(Vectors.dot(v, v), 6).as("sumsq"),
        round(aggregate(v, lit(0.0), (a, x) => a + abs(x)), 6).as("l1"),
        round(array_max(v), 6).as("vmax"),
        round(array_min(v), 6).as("vmin"))
    }),

    // A14: PSNR over array pairs (each embedding vs its successor — the
    // generated-vs-ground-truth pair shape). MSE via the dot decomposition
    // keeps both engines' summation order identical (see Stats.arrayMse).
    "a14_psnr" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
      e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"),
          round(graft.ops.Stats.arrayMse(col("a.v"), col("b.v")), 6).as("mse"),
          round(graft.ops.Stats.psnr(col("a.v"), col("b.v")), 6).as("psnr"))
    }),

    // A15: windowless SSIM over the same successor pairs — means/variances/
    // covariance from list sums and dot products, Wang-et-al stabilizers.
    "a15_ssim" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
      e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"),
          round(graft.ops.Stats.ssimLite(col("a.v"), col("b.v")), 6).as("ssim"))
    }),

    // A15b: sliding-window SSIM — the real SSIM shape: ssimLite mapped over
    // disjoint patches (4 windows of 16 elements across the 64-dim
    // vectors), averaged. Static unroll keeps every patch statistic inside
    // codegen'd column expressions; at image scale the same pattern maps
    // over patch arrays produced upstream.
    "a15b_ssim_windows" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), Vectors.asDouble(col("embedding")).as("v"))
      val wins = (0 until 4).map { w =>
        graft.ops.Stats.ssimLite(
          slice(col("a.v"), w * 16 + 1, 16), slice(col("b.v"), w * 16 + 1, 16))
      }
      e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"),
          round(wins.reduce(_ + _) / 4, 6).as("ssim_w"))
    }),

    // F6: JSON extraction from the events props column.
    "f6_json" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))))

  /** DuckDB fragment mirroring [[graft.ops.Stats.ssimLite]] over `n`-element
    * list expressions `a`/`b` — identical association order, so the values
    * are bit-equal before the round.
    */
  private def ssimSql(a: String, b: String, n: Int): String = {
    val ma = s"(list_sum($a) / $n)"
    val mb = s"(list_sum($b) / $n)"
    val saa = s"(list_dot_product($a, $a) / $n)"
    val sbb = s"(list_dot_product($b, $b) / $n)"
    val sab = s"(list_dot_product($a, $b) / $n)"
    s"(((2.0 * $ma * $mb + 0.0001) * (2.0 * ($sab - $ma * $mb) + 0.0009)) / " +
      s"(($ma * $ma + $mb * $mb + 0.0001) * " +
      s"(($saa - $ma * $ma) + ($sbb - $mb * $mb) + 0.0009)))"
  }

  def oracle: Map[String, String] = Map(
    "f1_string" ->
      """SELECT c_custkey,
                lower(c_name) AS name_lower,
                regexp_extract(c_name, '#(\d+)', 1) AS name_num,
                substring(c_mktsegment, 1, 3) AS seg3,
                lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
                c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS joined,
                CAST(length(c_name) AS INT) AS nlen,
                starts_with(c_name, 'Customer#0000000') AS starts,
                replace(c_mktsegment, 'E', '3') AS rep
         FROM customer""",
    "f2_datetime" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS yr,
                CAST(month(o_orderdate) AS INT) AS mo,
                CAST(quarter(o_orderdate) AS INT) AS qtr,
                CAST(day(o_orderdate) AS INT) AS dom,
                date_trunc('month', o_orderdate) AS mstart,
                CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01') AS INT) AS age_days,
                CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
         FROM orders""",
    "f3_math" ->
      """SELECT l_orderkey, l_linenumber,
                round(sqrt(l_extendedprice), 6) AS sq,
                round(power(l_discount + 1.0, 3), 6) AS pw,
                abs(l_quantity - 25.0) AS ab,
                CAST(floor(l_extendedprice) AS BIGINT) AS fl,
                CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
                least(l_quantity, l_extendedprice / 1000.0) AS ls,
                greatest(l_tax, l_discount) AS gr,
                round(ln(l_extendedprice), 6) AS ln_p,
                l_orderkey % 7 AS mod7
         FROM lineitem""",
    "f4_array_hof" ->
      """SELECT vec_id,
                CAST(len(embedding) AS INT) AS dims,
                round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm,
                round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6) AS sumsq,
                round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS l1,
                round(list_max(embedding::DOUBLE[]), 6) AS vmax,
                round(list_min(embedding::DOUBLE[]), 6) AS vmin
         FROM embeddings""",
    "a14_psnr" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              m AS (SELECT a.vec_id AS vec_id,
                           (list_dot_product(a.v, a.v)
                            - 2.0 * list_dot_product(a.v, b.v)
                            + list_dot_product(b.v, b.v)) / len(a.v) AS mse
                    FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id)
         -- mse = 0 guard mirrors the engine's explicit +Infinity (identical
         -- vectors): without it the result rides DuckDB's division-by-zero
         -- semantics, a latent cross-engine divergence (round-4 ADVICE)
         SELECT vec_id, round(mse, 6) AS mse,
                CASE WHEN mse = 0 THEN 'infinity'::DOUBLE
                     ELSE round(10.0 * log10(1.0 / mse), 6) END AS psnr
         FROM m""",
    "a15_ssim" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              p AS (SELECT a.vec_id AS vec_id, a.v AS av, b.v AS bv, len(a.v) AS n
                    FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id),
              m AS (SELECT vec_id,
                           list_sum(av) / n AS ma, list_sum(bv) / n AS mb,
                           list_dot_product(av, av) / n AS saa,
                           list_dot_product(bv, bv) / n AS sbb,
                           list_dot_product(av, bv) / n AS sab
                    FROM p)
         SELECT vec_id,
                round(((2.0 * ma * mb + 0.0001) * (2.0 * (sab - ma * mb) + 0.0009))
                      / ((ma * ma + mb * mb + 0.0001)
                         * ((saa - ma * ma) + (sbb - mb * mb) + 0.0009)), 6) AS ssim
         FROM m""",
    "a15b_ssim_windows" -> {
      // DuckDB list_slice bounds are INCLUSIVE (begin, end), both 1-based
      val wins = (0 until 4).map { w =>
        ssimSql(s"list_slice(av, ${w * 16 + 1}, ${w * 16 + 16})",
          s"list_slice(bv, ${w * 16 + 1}, ${w * 16 + 16})", 16)
      }.mkString(" + ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
               p AS (SELECT a.vec_id AS vec_id, a.v AS av, b.v AS bv
                     FROM e a JOIN e b ON a.vec_id + 1 = b.vec_id)
          SELECT vec_id, round(($wins) / 4, 6) AS ssim_w
          FROM p"""
    },
    "f6_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events""")
}
