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
  * `explode(distinctTokens(text))` — because: tokens are the same r17
  * Unicode normal form the other text kernels use ([[TokenClass]]:
  * `\p{L}\p{N}` runs, no-space-script chars solo, per-token lowercase);
  * the digest input is the same "<seed>|<token>" UTF-8 bytes; and
  * digests compare as raw unsigned bytes, which is exactly the
  * hex-string ordering `min` uses (byte→hex is monotone).
  *
  * EQUIVALENCE CONTRACT — CASE-FOLD ANOMALIES. Both sides now lowercase
  * per TOKEN (after the split), so split boundaries are case-independent
  * and the old U+212A-class divergence is gone. The remaining documented
  * divergence class is codepoints whose JDK lowercase disagrees with the
  * ORACLE engine's (DuckDB/utf8proc): context-sensitive Greek final
  * sigma and locale anomalies (U+0130 İ). The kernel matches SPARK
  * exactly (same JDK mapping); the oracle contract is for corpora
  * outside those anomalies — TextFunctionsSpec asserts kernel↔HOF parity
  * on Unicode generators.
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

  /** Distinct lowercased tokens under the r17 Unicode normal form — the
    * byte-level twin of `array_distinct(TextFunctions.tokens(s))`: token
    * runs are `\p{L}\p{N}` codepoints, no-space-script codepoints
    * (Han/kana/Thai) emit alone, ASCII folds in place, and a run
    * carrying any non-ASCII codepoint lowercases through the JDK (the
    * same full mapping Spark's `lower` applies per token). Shared by the
    * minhash and simhash kernels. UTF-8 token bytes feed the digest, so
    * the hex minima equal the relational form's over the same tokens.
    */
  def distinctTokens(s: UTF8String): java.util.ArrayList[Array[Byte]] = {
    val bytes = s.getBytes
    val n = bytes.length
    val seen = new java.util.HashSet[String]()
    val toks = new java.util.ArrayList[Array[Byte]]()
    val buf = new java.io.ByteArrayOutputStream(32)
    var runAscii = true
    def emit(): Unit = if (buf.size() > 0) {
      var t = buf.toByteArray
      buf.reset()
      if (!runAscii) {
        t = new String(t, java.nio.charset.StandardCharsets.UTF_8)
          .toLowerCase.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        runAscii = true
      }
      if (seen.add(new String(t, java.nio.charset.StandardCharsets.UTF_8)))
        toks.add(t)
    }
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0x80) == 0) {
        val tok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9')
        if (tok) buf.write(if (b >= 'A' && b <= 'Z') b | 0x20 else b)
        else emit()
        i += 1
      } else {
        val cp = TokenClass.cpAt(bytes, i, n)
        val len = TokenClass.cpLen(b)
        if (TokenClass.isTokenCp(cp)) {
          if (TokenClass.isSoloCp(cp)) {
            emit()
            buf.write(bytes, i, len); runAscii = false
            emit()
          } else { buf.write(bytes, i, len); runAscii = false }
        } else emit()
        i += len
      }
    }
    emit()
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

  /** BAND signatures straight off the k minima — exactly
    * `md5(array_join(slice(sig, b·bandSize+1, bandSize), "|"))` per band
    * b = 0..k/bandSize−1 over [[signatures]]' hex minima, or null for a
    * token-less document. One kernel evaluation per document emitting
    * every band (r17 optimization round): the projection form built on
    * [[signatures]] re-evaluated the whole MinHash walk per band branch
    * (CollapseProject inlines the sig expression into the null filter
    * AND each band's md5 — measured as the d7-family regression), while
    * this feeds a single posexplode. Parity with the aggregate
    * [[graft.dedup.Dedup.bandedSignatures]] form is asserted in
    * DedupSpec via the row-identity of the candidate sets.
    */
  def bandSignatures(s: UTF8String, k: Int, bandSize: Int): ArrayData = {
    val sig = signatures(s, k)
    if (sig == null) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val nBands = k / bandSize
    val pipe = "|".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      md.reset()
      var j = 0
      while (j < bandSize) {
        if (j > 0) md.update(pipe)
        md.update(sig.getUTF8String(b * bandSize + j).getBytes)
        j += 1
      }
      out(b) = UTF8String.fromString(toHex(md.digest()))
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native banded-signature expression — see
  * [[MinhashKernel.bandSignatures]]. Output: array of k/bandSize band
  * signatures (band index = array position), null for token-less docs.
  */
case class MinhashBandsExpr(child: Expression, k: Int, bandSize: Int)
    extends UnaryExpression {
  require(k >= 1 && bandSize >= 1 && k % bandSize == 0,
    s"graft_minhash_bands: bandSize=$bandSize must divide k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinhashKernel.bandSignatures(input.asInstanceOf[UTF8String], k, bandSize)

  // token-less docs yield null FROM NON-NULL INPUT (the explode-to-zero-
  // rows contract), so the generated code must re-derive isNull from the
  // kernel's result — defineCodeGen would propagate only the child's
  // nullability (the MinhashExpr discipline)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashKernel.bandSignatures($c, $k, $bandSize);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinhashBandsExpr =
    copy(child = newChild)
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
