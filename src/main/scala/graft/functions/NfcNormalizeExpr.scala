package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC kernel (top-level object ⇒ static forwarder callable from
  * generated code).
  *
  * WHY: the dedup normal form was whitespace+lowercase only, so composed
  * vs decomposed renderings of identical text (U+00E9 vs e+U+0301 —
  * ubiquitous in crawled text, which mixes editors, OSes, and CMSes) got
  * different fingerprints/MinHashes and were invisible to every dedup
  * stage (r15 verdict missing #2). NFC is the W3C-recommended wire
  * normal form; [[graft.pipelines.Pipelines.dedupCorpusStages]] applies
  * it to the text column at entry (default-on, `nfc = false` to opt
  * out), and the DuckDB oracle reproduces it with `nfc_normalize()`.
  *
  * FAST PATHS, in cost order: (1) pure-ASCII input (numBytes ==
  * numChars) returns AS-IS with no String materialization at all — the
  * overwhelming majority of any corpus; (2) non-ASCII but already-NFC
  * input passes `Normalizer.isNormalized`'s quick check and returns
  * the original UTF8String (one transient String for the check). Only
  * rows that actually need recomposition pay normalize + re-encode.
  */
object NfcKernel {

  def nfc(s: UTF8String): UTF8String = {
    // pure-ASCII bytes are NFC by construction — numBytes == numChars
    // ⇔ every code unit < 0x80 (UTF-8), so the overwhelmingly common
    // row returns without even a String materialization
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `graft_nfc(text)` — native codegen'd Unicode NFC normalization;
  * exposed as [[graft.text.TextFunctions.nfcNormalize]] and registered
  * for SQL via [[graft.extensions.GraftExtensions]]. Oracle twin:
  * DuckDB's `nfc_normalize(text)` (parity pinned by tx_nfc_fingerprint
  * and ScalaCheck'd in TextFunctionsSpec).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
