package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level token-run counting kernel shared by interpreted eval and the
  * generated code (top-level object ⇒ static forwarder, callable from
  * Janino-generated Java).
  */
object TokenCountKernel {
  /** Number of tokens under the Unicode word-token normal form (r17) —
    * exactly `size(TextFunctions.tokens(s))`: maximal `\p{L}\p{N}` runs,
    * with each no-space-script codepoint (Han/kana/Thai) its own token
    * ([[TokenClass]]'s walk semantics). Codepoint-at-a-time walk with an
    * ASCII fast path; still one pass, allocation-free.
    */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var c = 0
    var in = false
    while (i < n) {
      val b = bytes(i)
      if ((b & 0x80) == 0) { // ASCII fast path: never solo-script
        val tok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9')
        if (tok && !in) c += 1
        in = tok
        i += 1
      } else {
        val cp = TokenClass.cpAt(bytes, i, n)
        if (TokenClass.isTokenCp(cp)) {
          if (TokenClass.isSoloCp(cp)) { c += 1; in = false }
          else { if (!in) c += 1; in = true }
        } else in = false
        i += TokenClass.cpLen(b)
      }
    }
    c
  }
}

/** Native Catalyst expression for token counting, with `doGenCode` — stays
  * inside whole-stage codegen where the higher-order-function form
  * (`size(filter(split(...)))`) falls back to interpreted evaluation
  * (Spark's lambda HOFs are CodegenFallback) and allocates the full token
  * array per row just to count it. This walks the UTF8 bytes once,
  * allocation-free: the preferred shape for hot text-statistics paths over
  * billions of documents (build brief: native Expression > HOF > UDF).
  *
  * Registered as the SQL function `graft_token_count` via
  * [[graft.extensions.GraftExtensions]].
  */
case class TokenCountExpr(child: Expression) extends UnaryExpression {

  // ExpectsInputTypes needs the private[sql] AbstractDataType; check types
  // directly instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_count requires a string argument, got ${child.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCountKernel.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCountKernel.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountExpr =
    copy(child = newChild)
}
