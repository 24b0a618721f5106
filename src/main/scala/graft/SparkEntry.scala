package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's oracle-checked surface: one entry per
  * implemented operator from SURVEY §2 (query ids reference the inventory
  * rows). `oracleSql` carries the DuckDB-equivalent SQL for each; queries
  * with engine-specific semantics (e.g. HLL sketches) are rows-only checked
  * and intentionally absent from `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The SURVEY §7.2 minimum slice over oracle tables: difficulty
    * classification → exact-count stratified sampling under the reference's
    * 'hard' curriculum profile → per-stratum counts.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("x2_profile_counts")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QRelational.queries ++ QWindows.queries ++ QSampling.queries ++
      QScalars.queries ++ QEvents.queries ++ QText.queries ++
      QVectors.queries ++ QMultimodal.queries ++ QSources.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    QRelational.oracle ++ QWindows.oracle ++ QSampling.oracle ++
      QScalars.oracle ++ QEvents.oracle ++ QText.oracle ++
      QVectors.oracle ++ QMultimodal.oracle ++ QSources.oracle

  /** BOARD-SIZE GUARD. The correctness board once silently shrank when a
    * query started throwing (t7_sessionize, round 8) — Verify's per-query
    * try/catch kept the run alive and nobody noticed the missing output.
    * This count is the declared size of the query surface; EntryGuardSpec
    * asserts `queries.size` matches it (so a dropped/renamed/shadowed map
    * key fails the build), and Verify refuses to start when they disagree.
    * UPDATE THIS when adding or removing queries — that edit is the
    * explicit, reviewable act of changing the board.
    */
  val declaredQueryCount: Int = 228

  /** Queries intentionally absent from `oracleSql` — engine-specific
    * semantics (HLL sketch internals) that DuckDB can't reproduce; the
    * driver records a weaker rows-only check. EntryGuardSpec asserts this
    * set and the oracle keyset exactly partition `queries`, so an
    * accidentally-forgotten oracle entry is a build failure, not a silent
    * downgrade. (v9 left this set in round 10: its fixed-iteration
    * seeded Lloyd's unrolls into plain CTEs — QVectors.v9Sql.)
    */
  val rowsOnlyQueries: Set[String] = Set("a11_approx_distinct")
}
