package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic pseudo-randomness that is (a) stable across engines — the
  * same computation is expressible in ANSI SQL so a DuckDB oracle reproduces
  * it bit-for-bit — and (b) shuffle-safe: a pure column function of the row
  * key, unlike `rand(seed)` whose per-row value depends on partition layout.
  *
  * The reference pipeline shuffles and samples with *unseeded* Python RNG
  * (reference: train/common/dataset.py:213-222); every graft counterpart pins
  * determinism through this hash instead (SURVEY §7.4 item 4).
  *
  * h(k) = int(md5(string(k))[0:15], 16)   — 60 bits of entropy.
  *
  * The first 15 hex digits of the md5 fit a signed 64-bit integer
  * (16^15 = 2^60), so the parse is exact in both engines: Spark
  * `conv(substring(md5(...),1,15),16,10)` and DuckDB
  * `CAST('0x' || substring(md5(...),1,15) AS BIGINT)`. Unlike a modular
  * congruential hash, every distinct key gets an independent hash — no
  * residue-class correlation at any scale (at 10^12 keys the expected
  * collision count under 2^60 is ~0.4; ties are broken by the key itself
  * wherever the hash orders rows).
  */
object Determinism {

  /** Size of the hash space: 16^15 = 2^60. */
  val Space: Long = 1L << 60

  /** Column form: key column must be integral (cast to long internally).
    * Built directly on the native codegen'd kernel
    * ([[graft.functions.DetHashExpr]]) — bit-identical to the composed
    * `conv(substring(md5(...), 1, 15), 16, 10)` documented above (parity
    * asserted in DeterminismSpec), without the hex-string materialization
    * or a per-row MessageDigest. Constructed as an Expression, not via the
    * function registry, so library callers need no extension registration.
    */
  def detHash(key: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.DetHashExpr(
      ColumnShim.expression(key.cast("long"))))
  }

  /** The equivalent DuckDB-SQL fragment, for oracle queries. */
  def detHashSql(keyExpr: String): String =
    s"CAST('0x' || substring(md5(CAST(CAST($keyExpr AS BIGINT) AS VARCHAR)), 1, 15) AS BIGINT)"

  /** STRING-keyed form of [[detHash]] — the same md5 → first-15-hex-digits
    * fold over the key's string bytes, so for an integral key k,
    * `detHashStr(cast(k as string)) == detHash(k)` (the long form hashes
    * the decimal rendering). Built from codegen'd built-ins
    * (`conv(substring(md5(x), 1, 15), 16, 10)`) — one md5 per row, no
    * registration needed. This is the dedup chain's internal SURROGATE id
    * for non-integral doc ids ([[graft.pipelines.Pipelines
    * .dedupCorpusStages]]): 60 bits, oracle-expressible via
    * [[detHashStrSql]], collision-checked by the caller at entry
    * (expected collisions at 10^9 string keys: ~4·10^-4).
    */
  def detHashStr(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** DuckDB-SQL fragment for [[detHashStr]] (expects a VARCHAR expr). */
  def detHashStrSql(keyExpr: String): String =
    s"CAST('0x' || substring(md5(CAST($keyExpr AS VARCHAR)), 1, 15) AS BIGINT)"

  /** Deterministic stand-in for `rand(seed)` in [0, 1). */
  def detRand(key: Column): Column = detHash(key) / lit(Space.toDouble)

  /** DuckDB-SQL fragment for [[detRand]]. */
  def detRandSql(keyExpr: String): String =
    s"(${detHashSql(keyExpr)} / $Space.0)"

  /** Driver-side evaluation of the same hash — used to pre-materialize
    * constant tables (e.g. ANN hyperplanes) without per-row hashing.
    * Exactly matches [[detHash]] for non-negative keys.
    */
  def detHashLocal(key: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(key.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Driver-side [[detRand]]. */
  def detRandLocal(key: Long): Double = detHashLocal(key) / Space.toDouble
}
