package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic pseudo-randomness that is (a) stable across engines — the
  * same arithmetic is expressible in ANSI SQL so a DuckDB oracle reproduces it
  * bit-for-bit — and (b) shuffle-safe: a pure column function of the row key,
  * unlike `rand(seed)` whose per-row value depends on partition layout.
  *
  * The reference pipeline shuffles and samples with *unseeded* Python RNG
  * (reference: train/common/dataset.py:213-222); every graft counterpart pins
  * determinism through this hash instead (SURVEY §7.4 item 4).
  *
  * h(k) = ((k mod 100003) * 2654435761 + 12345) mod 1000000007
  *
  * 2654435761 is Knuth's multiplicative-hash constant; the pre-mod by the
  * prime 100003 bounds the product far below 2^63 so the arithmetic is exact
  * under ANSI overflow checking in both engines.
  */
object Determinism {

  val PreMod: Long  = 100003L
  val Mult: Long    = 2654435761L
  val Add: Long     = 12345L
  val OutMod: Long  = 1000000007L

  /** Column form: key column must be integral (cast to long internally). */
  def detHash(key: Column): Column =
    (key.cast("long") % PreMod * Mult + Add) % OutMod

  /** The equivalent ANSI-SQL fragment, for oracle queries. */
  def detHashSql(keyExpr: String): String =
    s"(($keyExpr % $PreMod) * $Mult + $Add) % $OutMod"

  /** Deterministic stand-in for `rand(seed)` in [0, 1). */
  def detRand(key: Column): Column = detHash(key) / lit(OutMod.toDouble)
}
