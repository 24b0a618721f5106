package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing-signature kernel (top-level object ⇒ static
  * forwarder callable from Janino-generated code).
  *
  * Semantics are bit-identical to the HOF composition in
  * [[graft.text.TextFunctions.ngramSignature]]:
  * `array_join(slice(array_sort(transform(array_distinct(charNgrams(text,n)),
  * md5)), 1, k), "|")` — the k lexicographically-smallest md5 hex digests
  * over the document's distinct character n-grams.
  *
  * Why a kernel: the HOF chain materializes five intermediate arrays per row
  * (ngram transform, distinct, md5 transform, sort, slice) and every lambda
  * evaluates interpreted (Spark HOFs are CodegenFallback). This walks the
  * grams once keeping a k-entry bounded ladder of the smallest digests —
  * no intermediate arrays, no full sort (O(grams·k) with k=4), digests
  * compared as raw bytes (unsigned byte order == hex-string order since
  * byte→hex is monotone).
  */
object NgramSignatureKernel {

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def signature(s: UTF8String, n: Int, k: Int): UTF8String = {
    val chars = s.numChars()
    // gram start positions 1..max(chars-(n-1), 1) — same bounds as
    // sequence(1, greatest(length-n+1, 1)); a doc shorter than n yields
    // one (short) gram, an empty doc the md5 of "".
    val upper = math.max(chars - (n - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    // ASCII fast path: one bytes copy per row, then digest byte slices
    // directly; multi-byte text falls back to substringSQL per gram.
    val ascii = s.numBytes == chars
    val bytes = if (ascii) s.getBytes else null
    // sorted ladder of the k smallest DISTINCT digests seen so far
    val top = new Array[Array[Byte]](k)
    var cnt = 0
    var i = 1
    while (i <= upper) {
      md.reset()
      if (ascii) {
        val off = i - 1
        md.update(bytes, off, math.min(n, bytes.length - off))
      } else {
        md.update(s.substringSQL(i, n).getBytes)
      }
      val d = md.digest()
      // find insertion point; drop duplicates and anything not smaller
      // than the current k-th
      var lo = 0
      var dup = false
      while (lo < cnt && !dup) {
        val c = java.util.Arrays.compareUnsigned(top(lo), d)
        if (c == 0) dup = true
        else if (c < 0) lo += 1
        else { /* found insertion point */
          var j = math.min(cnt, k - 1)
          while (j > lo) { top(j) = top(j - 1); j -= 1 }
          top(lo) = d
          if (cnt < k) cnt += 1
          dup = true // inserted; stop scanning
        }
      }
      if (!dup && cnt < k) { top(cnt) = d; cnt += 1 }
      i += 1
    }
    val sb = new java.lang.StringBuilder(cnt * 33)
    var j = 0
    while (j < cnt) {
      if (j > 0) sb.append('|')
      sb.append(toHex(top(j)))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Native codegen'd form of the n-gram winnowing signature, registered as
  * the SQL function `graft_ngram_sig(text, n, k)` via
  * [[graft.extensions.GraftExtensions]]. See [[NgramSignatureKernel]] for
  * semantics and the performance rationale.
  */
case class NgramSignatureExpr(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1, s"graft_ngram_sig needs n >= 1 and k >= 1, got n=$n k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_sig requires a string argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ngram_sig"

  override protected def nullSafeEval(input: Any): Any =
    NgramSignatureKernel.signature(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramSignatureKernel.signature($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): NgramSignatureExpr =
    copy(child = newChild)
}
