package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-statistic kernels (top-level object ⇒ static forwarders
  * callable from generated code). Each is bit-identical to its HOF/regexp
  * twin in [[graft.text.TextFunctions]] — same integer counts, same final
  * double division — but walks the UTF-8 bytes once, allocation-free,
  * where the HOF forms materialize interpreted token arrays per row
  * (Spark lambda HOFs are CodegenFallback).
  */
object TextStatsKernel {

  @inline private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  @inline private def low(b: Byte): Int =
    if (b >= 'A' && b <= 'Z') b + 32 else b.toInt

  /** Punctuation ratio — `[^\p{L}\p{N} ]` codepoints / codepoints
    * (matching Spark's `length`), the Unicode class of the r17 token
    * normal form: letters and numbers of every script are content, not
    * punctuation. ASCII bytes classify without decoding.
    */
  def punctRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    var chars = 0
    var punct = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0x80) == 0) {
        chars += 1
        if (!(isTok(b) || b == ' ')) punct += 1
        i += 1
      } else {
        chars += 1
        if (!TokenClass.isTokenCp(TokenClass.cpAt(bytes, i, n))) punct += 1
        i += TokenClass.cpLen(b)
      }
    }
    if (chars == 0) 0.0 else punct.toDouble / chars
  }

  /** Mean token length in CODEPOINTS over the r17 Unicode token walk
    * (solo-script codepoints are length-1 tokens; runs count their
    * codepoints — matching `length()` over [[graft.text.TextFunctions
    * .tokens]]' lowered tokens for every case-fold-length-stable corpus,
    * the documented contract). 0.0 when tokenless.
    */
  def avgTokenLen(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    var sum = 0L
    var cnt = 0
    var run = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0x80) == 0) {
        if (isTok(b)) run += 1
        else if (run > 0) { sum += run; cnt += 1; run = 0 }
        i += 1
      } else {
        val cp = TokenClass.cpAt(bytes, i, n)
        if (TokenClass.isTokenCp(cp)) {
          if (TokenClass.isSoloCp(cp)) {
            if (run > 0) { sum += run; cnt += 1; run = 0 }
            sum += 1; cnt += 1
          } else run += 1
        } else if (run > 0) { sum += run; cnt += 1; run = 0 }
        i += TokenClass.cpLen(b)
      }
    }
    if (run > 0) { sum += run; cnt += 1 }
    if (cnt == 0) 0.0 else sum.toDouble / cnt
  }

  // the stopword list of TextFunctions.stopwordRatio, grouped by length
  private val stop1 = Array("a")
  private val stop2 = Array("an", "or", "of", "to", "in", "is", "it")
  private val stop3 = Array("the", "and", "for")
  private val stop4 = Array("that")

  @inline private def runEq(s: UTF8String, start: Int, w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      if (low(s.getByte(start + i)) != w.charAt(i)) return false
      i += 1
    }
    true
  }

  private def isStop(s: UTF8String, start: Int, len: Int): Boolean = {
    val cands = len match {
      case 1 => stop1
      case 2 => stop2
      case 3 => stop3
      case 4 => stop4
      case _ => return false
    }
    var i = 0
    while (i < cands.length) {
      if (runEq(s, start, cands(i))) return true
      i += 1
    }
    false
  }

  /** English stopword ratio among lowercased tokens — the r17 Unicode
    * token walk for COUNTING (every script's tokens enter the
    * denominator; solo-script chars are tokens, never stopwords), with
    * the stopword MATCH still byte-level: the list is pure ASCII, and no
    * non-ASCII token can lowercase-fold onto it (a run containing any
    * non-ASCII codepoint is disqualified before the compare). 0.0 when
    * tokenless.
    */
  def stopRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    var cnt = 0
    var stops = 0
    var runStart = -1
    var runAscii = true
    def endRun(end: Int): Unit = if (runStart >= 0) {
      cnt += 1
      if (runAscii && isStop(s, runStart, end - runStart)) stops += 1
      runStart = -1; runAscii = true
    }
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0x80) == 0) {
        if (isTok(b)) { if (runStart < 0) runStart = i }
        else endRun(i)
        i += 1
      } else {
        val cp = TokenClass.cpAt(bytes, i, n)
        if (TokenClass.isTokenCp(cp)) {
          if (TokenClass.isSoloCp(cp)) { endRun(i); cnt += 1 }
          else { if (runStart < 0) runStart = i; runAscii = false }
        } else endRun(i)
        i += TokenClass.cpLen(b)
      }
    }
    endRun(n)
    if (cnt == 0) 0.0 else stops.toDouble / cnt
  }
}

/** Base class for the string→double kernel expressions. */
abstract class TextStatExpr extends UnaryExpression {
  def kernelCall: String

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  override def dataType: DataType = DoubleType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsKernel.$kernelCall($c)")
}

/** `graft_punct_ratio(text)` — native twin of TextFunctions.punctRatio. */
case class PunctRatioExpr(child: Expression) extends TextStatExpr {
  override def prettyName: String = "graft_punct_ratio"
  override def kernelCall: String = "punctRatio"
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.punctRatio(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): PunctRatioExpr =
    copy(child = newChild)
}

/** `graft_avg_token_len(text)` — native twin of TextFunctions.avgTokenLen. */
case class AvgTokenLenExpr(child: Expression) extends TextStatExpr {
  override def prettyName: String = "graft_avg_token_len"
  override def kernelCall: String = "avgTokenLen"
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.avgTokenLen(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): AvgTokenLenExpr =
    copy(child = newChild)
}

/** `graft_stop_ratio(text)` — native twin of TextFunctions.stopwordRatio. */
case class StopRatioExpr(child: Expression) extends TextStatExpr {
  override def prettyName: String = "graft_stop_ratio"
  override def kernelCall: String = "stopRatio"
  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.stopRatio(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): StopRatioExpr =
    copy(child = newChild)
}
