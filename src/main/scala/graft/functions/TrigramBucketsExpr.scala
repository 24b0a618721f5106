package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed char-trigram bucket-count kernel for the trained language-ID
  * features ([[graft.text.LangIdClassifier]]): ONE code-point walk over
  * the text produces `[total, count₀ … count_{k-1}]` — the trigram total
  * and the per-bucket counts under the engine-portable hash
  * `(cp₁·961 + cp₂·31 + cp₃) mod k`.
  *
  * Bit-identical to the HOF twin (`charNgrams(text, 3)` filtered to full
  * trigrams, bucketed by `ascii(substring(g, i, 1))` code points —
  * parity asserted in LangIdClassifierSpec including multibyte AND
  * supplementary-plane text; Spark 4's `ascii()` returns the full code
  * point for 4-byte chars, e.g. 128512 for U+1F600, so the twin does
  * not fall back to a UTF-16 surrogate):
  * Spark's `length`/`substring`/`ascii` are all code-point based, and so
  * is this walk (1-4 byte UTF-8 sequences decode to one code point; a
  * 4-byte supplementary character is ONE trigram position, exactly as in
  * `substring`). Contract: valid UTF-8 input — the testdata and any text
  * Spark itself produced is; malformed bytes would decode differently
  * from the substring path.
  *
  * Why a kernel: the HOF form is CodegenFallback and — worse — feature
  * and score columns are separate expressions, so CollapseProject inlines
  * the whole interpreted gram walk into EACH of them (measured ~290 s at
  * sf0.1 for the trained-langid query; the kernel form is one
  * allocation-light walk per doc inside whole-stage codegen).
  */
object TrigramBucketsKernel {

  /** `[total, count₀ … count_{k-1}]` for the text's full char trigrams. */
  def counts(s: UTF8String, k: Int): ArrayData = {
    val out = new Array[Long](k + 1)
    val n = s.numBytes
    var i = 0
    var cp1 = -1
    var cp2 = -1
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b < 0x80) cp = b
      else if ((b & 0xE0) == 0xC0) { cp = b & 0x1F; len = 2 }
      else if ((b & 0xF0) == 0xE0) { cp = b & 0x0F; len = 3 }
      else { cp = b & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3F)
        j += 1
      }
      i += len
      if (cp2 >= 0 && cp1 >= 0) {
        val h = cp2.toLong * 961 + cp1.toLong * 31 + cp
        out(1 + (h % k).toInt) += 1
        out(0) += 1
      }
      cp2 = cp1
      cp1 = cp
    }
    new GenericArrayData(out)
  }
}

/** `graft_trigram_buckets(text, k)` — see [[TrigramBucketsKernel]]. */
case class TrigramBucketsExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_trigram_buckets requires (string, k > 0), got " +
        s"(${child.dataType}, $k)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_trigram_buckets"

  override protected def nullSafeEval(input: Any): Any =
    TrigramBucketsKernel.counts(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TrigramBucketsKernel.counts($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): TrigramBucketsExpr =
    copy(child = newChild)
}
