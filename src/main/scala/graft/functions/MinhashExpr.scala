package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash kernel: all k per-seed signature minima in ONE
  * pass over the text (top-level object ⇒ static forwarder callable from
  * Janino-generated code).
  *
  * Bit-identical to the relational form it replaces —
  * `min(md5(concat(lit("i|"), shingle)))` per seed over
  * `explode(distinctTokens(text))` — because: tokens are the same
  * lowercased ASCII-alphanumeric byte runs the other text kernels use
  * (every non-alphanumeric byte, including UTF-8 continuation bytes, is a
  * separator — the [^a-z0-9]+ split); the digest input is the same
  * "<seed>|<token>" bytes; and digests compare as raw unsigned bytes,
  * which is exactly the hex-string ordering `min` uses (byte→hex is
  * monotone).
  *
  * EQUIVALENCE CONTRACT — ASCII-ONLY CASE FOLDING. The byte walk folds
  * only A-Z; the relational twin uses Unicode `lower()`. They agree on any
  * text whose lowercase mapping stays within ASCII identity (all of ASCII,
  * and all non-ASCII codepoints since both sides treat their bytes as
  * separators) — but a codepoint whose UNICODE lowercase maps INTO ASCII
  * (U+212A KELVIN SIGN → 'k', U+0130 İ → 'i̇') tokenizes differently:
  * `lower()` turns it into a token byte, the kernel splits on it. This
  * applies to every byte-walk kernel sharing [[distinctTokens]] /
  * TextStatsKernel (graft_minhash, graft_simhash, graft_stop_ratio,
  * graft_avg_token_len): the bit-identity guarantee is for ASCII-foldable
  * corpora; TextFunctionsSpec documents the divergence on U+212A
  * explicitly.
  *
  * Why a kernel: the relational form explodes (doc × distinct-token) rows
  * through a shuffle into a k-column hash aggregate. This computes the
  * same k minima inside the scan's projection — the signature stage needs
  * NO shuffle at all, which at 100 TB removes the largest intermediate of
  * the whole LSH pipeline (token rows ≫ doc rows).
  */
object MinhashKernel {

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

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** Distinct lowercased tokens (byte runs of [A-Za-z0-9], case-folded) —
    * the byte-level twin of `array_distinct(filter(split(lower(s),
    * "[^a-z0-9]+"), _ != ""))`, shared by the minhash and simhash kernels.
    */
  def distinctTokens(s: UTF8String): java.util.ArrayList[Array[Byte]] = {
    val bytes = s.getBytes
    val seen = new java.util.HashSet[String]()
    val toks = new java.util.ArrayList[Array[Byte]]()
    val buf = new java.io.ByteArrayOutputStream(32)
    var i = 0
    while (i <= bytes.length) {
      val b = if (i < bytes.length) bytes(i) else ' '.toByte
      val isTok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9')
      if (isTok) {
        buf.write(if (b >= 'A' && b <= 'Z') b | 0x20 else b)
      } else if (buf.size() > 0) {
        val t = buf.toByteArray
        buf.reset()
        if (seen.add(new String(t, java.nio.charset.StandardCharsets.US_ASCII)))
          toks.add(t)
      }
      i += 1
    }
    toks
  }

  /** Array of k hex minima (seed order 0..k-1), or null when the document
    * has no tokens — matching the exploded form, where a token-less doc
    * contributes no signature rows at all.
    */
  def signatures(s: UTF8String, k: Int): ArrayData = {
    val toks = distinctTokens(s)
    if (toks.isEmpty) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val prefixes = new Array[Array[Byte]](k)
    var p = 0
    while (p < k) {
      prefixes(p) = (p.toString + "|")
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      p += 1
    }
    val mins = new Array[Array[Byte]](k)
    var t = 0
    while (t < toks.size()) {
      val tb = toks.get(t)
      var sIdx = 0
      while (sIdx < k) {
        md.reset()
        md.update(prefixes(sIdx))
        md.update(tb)
        val d = md.digest()
        if (mins(sIdx) == null || lessUnsigned(d, mins(sIdx))) mins(sIdx) = d
        sIdx += 1
      }
      t += 1
    }
    val out = new Array[Any](k)
    var o = 0
    while (o < k) {
      out(o) = UTF8String.fromString(toHex(mins(o)))
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** Whole-document SimHash kernel: md5 each distinct token once, vote all
  * 32 bits, return the 32 bit values (index order 1..32) — or null for a
  * token-less document. Bit i votes +1 when hex digit i of md5(token) is
  * >= '8' (top bit of the nibble), −1 otherwise; the sign of the vote sum
  * is the bit. Identical numbers to the 32-conditional-sum aggregate form
  * in [[graft.dedup.Dedup.simhashBitsExploded]], computed without
  * shuffling (doc, token) rows.
  */
object SimhashKernel {

  def bits(s: UTF8String): ArrayData = {
    val toks = MinhashKernel.distinctTokens(s)
    if (toks.isEmpty) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](32)
    var t = 0
    while (t < toks.size()) {
      md.reset()
      val d = md.digest(toks.get(t))
      // hex digit i (1-based) >= '8' ⇔ the nibble's top bit is set
      var i = 0
      while (i < 16) {
        val b = d(i) & 0xff
        votes(2 * i) += (if ((b & 0x80) != 0) 1 else -1)
        votes(2 * i + 1) += (if ((b & 0x08) != 0) 1 else -1)
        i += 1
      }
      t += 1
    }
    val out = new Array[Any](32)
    var o = 0
    while (o < 32) {
      out(o) = if (votes(o) > 0) 1 else 0
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for [[SimhashKernel]]; registered as the SQL
  * function `graft_simhash`.
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimhashKernel.bits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SimhashKernel.bits($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

/** Native Catalyst expression wrapping [[MinhashKernel]]; registered as the
  * SQL function `graft_minhash` via [[graft.extensions.GraftExtensions]]
  * and used directly (no registration needed) by
  * [[graft.dedup.Dedup.minhashSignatures]].
  */
case class MinhashExpr(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires (string, k > 0), got (${child.dataType}, $k)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    MinhashKernel.signatures(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashKernel.signatures($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinhashExpr =
    copy(child = newChild)
}
