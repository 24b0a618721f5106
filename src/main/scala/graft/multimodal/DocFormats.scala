package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DOCUMENT-format routing for raw-crawl binary payloads (r17 verdict
  * #6): a crawl's [[graft.sources.Wet.readWarcBinary]] path lands PDFs,
  * office files, and archives as blobs; this family tags them
  * (header-only, no decode — the [[Multimodal.magicFormat]] discipline)
  * and routes each to its processing path:
  *
  *  - `image`/`audio`/`video`/`array` → the existing multimodal decode
  *    and fingerprint machinery;
  *  - `document` (pdf/ole2/rtf/ps) → text extraction. PDF gets a
  *    minimal IN-ENGINE pull ([[extractPdfText]]): uncompressed and
  *    FlateDecode content streams (java.util.zip.Inflater is stock
  *    JDK), BT..ET text blocks, `(string) Tj`/`TJ` operands. That
  *    covers simple generated PDFs; anything further (CID fonts,
  *    ToUnicode CMaps, encrypted documents, office/epub XML) is an
  *    OUT-OF-ENGINE decode-stage concern — the U3 model-kernel
  *    discipline (SURVEY §7.5): the engine routes and carries the
  *    bytes, a specialized extractor container owns the decode, and
  *    its text re-enters through the documents schema.
  *  - `archive` (zip/gzip) → container handling (zip members are how
  *    docx/epub arrive; the router deliberately tags the CONTAINER —
  *    member sniffing is the extractor's job).
  */
object DocFormats {

  /** Header-only format sniff over document + media magics — extends
    * [[Multimodal.magicFormat]] with the document/archive formats a raw
    * crawl actually serves. Pure codegen'd expression; DuckDB replays
    * the same hex prefixes (u7_format_router).
    */
  def docFormat(c: Column): Column = {
    val head = upper(hex(substring(c, 1, 9)))
    when(head.startsWith("255044462D"), "pdf") // %PDF-
      .when(head.startsWith("504B0304") || head.startsWith("504B0506") ||
        head.startsWith("504B0708"), "zip") // PK.. (docx/xlsx/epub/jar)
      .when(head.startsWith("D0CF11E0A1B11AE1"), "ole2") // legacy .doc/.xls
      .when(head.startsWith("1F8B"), "gzip")
      .when(head.startsWith("7B5C727466"), "rtf") // {\rtf
      .when(head.startsWith("252150532D"), "ps") // %!PS-
      .when(head.startsWith("595556344D50454732"), "y4m") // YUV4MPEG2
      .otherwise(Multimodal.magicFormat(c))
  }

  /** Processing-path family for a sniffed format tag. */
  def formatFamily(fmt: Column): Column =
    when(fmt.isin("png", "jpeg", "gif", "bmp"), "image")
      .when(fmt === "riff", "audio")
      .when(fmt === "y4m", "video")
      .when(fmt === "npy", "array")
      .when(fmt.isin("pdf", "ole2", "rtf", "ps"), "document")
      .when(fmt.isin("zip", "gzip"), "archive")
      .otherwise("unknown")

  /** (id, format, family) router over a binary column — one row per
    * blob, header bytes only (column pruning keeps payloads unread when
    * downstream filters on the family).
    */
  def routeFormats(files: DataFrame, id: Column, content: Column): DataFrame = {
    val fmt = docFormat(content)
    files.select(id.as("doc_id"), fmt.as("format"),
      formatFamily(fmt).as("family"))
  }

  /** Inflate a zlib (FlateDecode) stream; corrupt input yields empty —
    * the P7 null-drop convention, never an executor throw.
    */
  private def inflate(b: Array[Byte]): Array[Byte] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream(math.max(b.length * 4, 64))
      val buf = new Array[Byte](8192)
      var ok = true
      while (ok && !inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) ok = false
      }
      inf.end()
      if (ok) out.toByteArray else Array.emptyByteArray
    } catch { case _: Exception => Array.emptyByteArray }

  /** Text operands of one decoded content stream: strings shown inside
    * BT..ET blocks — `(...) Tj`, `(...)'`, and the string members of
    * `[...] TJ` arrays all surface their parenthesized operands in
    * order; PDF string escapes \( \) \\ \n \r \t unescape, unknown
    * escapes drop the backslash (the spec's rule). Parenthesis nesting
    * is tracked (balanced parens inside a string are legal unescaped).
    */
  private def streamText(cs: String): String = {
    val out = new StringBuilder
    var i = 0
    var inBT = false
    while (i < cs.length) {
      if (!inBT && cs.startsWith("BT", i)) { inBT = true; i += 2 }
      else if (inBT && cs.startsWith("ET", i)) {
        inBT = false; out.append(' '); i += 2
      } else if (inBT && cs.charAt(i) == '(') {
        i += 1
        var depth = 1
        while (i < cs.length && depth > 0) {
          val ch = cs.charAt(i)
          if (ch == '\\' && i + 1 < cs.length) {
            cs.charAt(i + 1) match {
              case 'n' => out.append('\n')
              case 'r' => out.append('\r')
              case 't' => out.append('\t')
              case o   => out.append(o)
            }
            i += 2
          } else if (ch == '(') { depth += 1; out.append(ch); i += 1 }
          else if (ch == ')') {
            depth -= 1; if (depth > 0) out.append(ch); i += 1
          } else { out.append(ch); i += 1 }
        }
        out.append(' ')
      } else i += 1
    }
    out.toString
  }

  /** Minimal pure-JDK PDF text pull — the in-engine half of the
    * document boundary: walk `stream`..`endstream` spans, inflate
    * FlateDecode streams, collect BT..ET text operands
    * ([[streamText]]), collapse whitespace. Returns "" for anything it
    * cannot read (encrypted, exotic filters, non-PDF bytes) — routing
    * such blobs to the out-of-engine extractor is the caller's policy.
    */
  def pdfText(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-")) return ""
    val out = new StringBuilder
    var idx = s.indexOf("stream")
    while (idx >= 0) {
      val dictStart = s.lastIndexOf("<<", idx)
      val dict = if (dictStart >= 0) s.substring(dictStart, idx) else ""
      var ds = idx + "stream".length
      if (ds < s.length && s.charAt(ds) == '\r') ds += 1
      if (ds < s.length && s.charAt(ds) == '\n') ds += 1
      val de = s.indexOf("endstream", ds)
      if (de < 0) idx = -1
      else {
        val raw = java.util.Arrays.copyOfRange(bytes, ds, de)
        val content =
          if (dict.contains("/FlateDecode")) inflate(raw) else raw
        out.append(streamText(new String(content,
          java.nio.charset.StandardCharsets.ISO_8859_1)))
        idx = s.indexOf("stream", de + "endstream".length)
      }
    }
    out.toString.replaceAll("\\s+", " ").trim
  }

  /** (doc_id, text) from a PDF binary column — id rides raw with its
    * type preserved (the [[Multimodal.keyedBytes]] comparison-only
    * contract). Blobs yielding no text are KEPT with text "" so the
    * caller can count the out-of-engine backlog (`text = ''` IS the
    * routing signal), not silently dropped.
    */
  def extractPdfText(files: DataFrame, id: Column, content: Column): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val (keyed, idType) = Multimodal.keyedBytes(files, id, content)
    keyed.map { case (docId, bytes) => (docId, pdfText(bytes)) }
      .toDF("doc_id", "text")
      .withColumn("doc_id", col("doc_id").cast(idType))
  }

  /** Deterministic minimal-PDF fixture: one page, one content stream
    * carrying `text` as a single Tj operand — optionally FlateDecode-
    * compressed (java.util.zip.Deflater, fixed level for byte-stable
    * output). Parsable by [[pdfText]] AND structurally plausible
    * (header, page tree, xref-less but readers that scan streams cope).
    */
  def pdfFixture(text: String, flate: Boolean): Array[Byte] = {
    val esc = text.replace("\\", "\\\\").replace("(", "\\(")
      .replace(")", "\\)")
    val contentRaw =
      s"BT /F1 12 Tf 72 720 Td ($esc) Tj ET"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val content =
      if (!flate) contentRaw
      else {
        val d = new java.util.zip.Deflater(6)
        d.setInput(contentRaw); d.finish()
        val out = new java.io.ByteArrayOutputStream(contentRaw.length + 32)
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end(); out.toByteArray
      }
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val head = ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length}$filter >> stream\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val tail = "\nendstream endobj\n%%EOF\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new Array[Byte](head.length + content.length + tail.length)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(content, 0, out, head.length, content.length)
    System.arraycopy(tail, 0, out, head.length + content.length, tail.length)
    out
  }
}
