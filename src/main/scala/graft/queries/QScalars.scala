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

    // F6: JSON extraction from the events props column.
    "f6_json" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))))

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
    "f6_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events""")
}
