package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Kernel for the engine's deterministic 60-bit hash (top-level object ⇒
  * static forwarder callable from generated code).
  *
  * Bit-identical to the composed form
  * `conv(substring(md5(cast(key as string)), 1, 15), 16, 10)` — the first
  * 15 hex digits of the md5 are the big-endian unsigned value of the first
  * 8 digest bytes shifted right one nibble — but with none of the hex
  * string materialization, substring, or base-16 reparse, and the
  * MessageDigest reused per thread instead of allocated per row. The
  * composed form remains in [[graft.ops.Determinism]]'s Scaladoc as the
  * oracle-SQL contract; DeterminismSpec asserts bit parity.
  */
object DetHashKernel {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(key: Long): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(java.lang.Long.toString(key)
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }
}

/** `graft_det_hash(key)` — native codegen'd form of [[DetHashKernel.hash]];
  * used by every deterministic-sampling operator through
  * [[graft.ops.Determinism.detHash]] (built directly as an Expression, no
  * function-registry dependency) and registered for SQL via
  * [[graft.extensions.GraftExtensions]].
  */
case class DetHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_det_hash requires a bigint argument, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_det_hash"

  override protected def nullSafeEval(input: Any): Any =
    DetHashKernel.hash(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DetHashKernel.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): DetHashExpr =
    copy(child = newChild)
}
