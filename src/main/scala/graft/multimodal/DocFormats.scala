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
  *    JDK), BT..ET text blocks, `(string) Tj`/`TJ` operands. RTF gets
  *    [[rtfText]] (destination-suppressed control-word walk).
  *  - `archive` (zip/gzip) → container handling: [[zipMembers]] lists,
  *    [[officeText]] pulls OOXML text (docx `<w:t>` / xlsx
  *    sharedStrings / pptx `<a:t>` in one streaming member walk), and
  *    [[epubHtml]] surfaces an OCF book's spine for the standard HTML
  *    extraction. [[documentText]] is the magic-dispatched union the
  *    `--warc-docs` ingest consumes.
  *
  * What stays OUT-OF-ENGINE — the U3 model-kernel discipline (SURVEY
  * §7.5): CID fonts / ToUnicode CMaps / encrypted PDFs, legacy ole2
  * binary formats, PostScript. For those the engine routes and carries
  * the bytes ('' from the pulls IS the routing signal), a specialized
  * extractor container owns the decode, and its text re-enters through
  * the documents schema.
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

  /** Member listing of a zip-family blob (docx/xlsx/epub/jar arrive as
    * zip containers): (doc_id, member, n_bytes) via the JDK's streaming
    * local-header walk — no central-directory random access, so it
    * composes with record-streamed ingest where the blob is already the
    * only resident record. Corrupt containers yield zero rows (the P7
    * null-drop convention).
    */
  def zipMembers(files: DataFrame, id: Column, content: Column): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val (keyed, idType) = Multimodal.keyedBytes(files, id, content)
    keyed.flatMap { case (docId, bytes) =>
        val out = Seq.newBuilder[(String, String, Long)]
        try {
          val zin = new java.util.zip.ZipInputStream(
            new java.io.ByteArrayInputStream(bytes))
          var e = zin.getNextEntry
          while (e != null) {
            if (!e.isDirectory) {
              var n = 0L
              val buf = new Array[Byte](8192)
              var r = zin.read(buf)
              while (r >= 0) { n += r; r = zin.read(buf) }
              out += ((docId, e.getName, n))
            }
            e = zin.getNextEntry
          }
          zin.close()
        } catch { case _: Exception => () }
        out.result()
      }.toDF("doc_id", "member", "n_bytes")
      .withColumn("doc_id", col("doc_id").cast(idType))
  }

  /** One zip member's bytes, or null. Streaming local-header walk. */
  private def zipMember(bytes: Array[Byte], name: String): Array[Byte] =
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) {
          val out = new java.io.ByteArrayOutputStream(8192)
          val buf = new Array[Byte](8192)
          var r = zin.read(buf)
          while (r >= 0) { out.write(buf, 0, r); r = zin.read(buf) }
          zin.close()
          return out.toByteArray
        }
        e = zin.getNextEntry
      }
      zin.close(); null
    } catch { case _: Exception => null }

  /** Text of a DOCX (WordprocessingML) blob: the `word/document.xml`
    * member's `<w:t>` runs, paragraphs (`</w:p>`) becoming single
    * spaces after the whitespace collapse, the XML entities decoded
    * (&amp; LAST — the HTML-extraction discipline). Minimal by design:
    * tables/headers/footnotes live in other members and styling is
    * ignored; documents this misses route out-of-engine like exotic
    * PDFs (text = "" is the signal). Pure JDK.
    */
  def docxText(bytes: Array[Byte]): String = {
    val doc = zipMember(bytes, "word/document.xml")
    if (doc == null) return ""
    xmlRuns(new String(doc, java.nio.charset.StandardCharsets.UTF_8),
      "w:t", "</w:p>")
  }

  /** Text runs of one OOXML part: the content of every `<tag …>…</tag>`
    * element, `blockEnd` closers (paragraph / cell / shape-paragraph)
    * becoming single spaces, XML entities decoded (&amp; LAST),
    * whitespace collapsed. The shared walk behind the docx/xlsx/pptx
    * pulls — OOXML keeps visible text in leaf run elements, so a leaf
    * scan IS the text model (styling lives in sibling property
    * elements that are simply never entered).
    */
  private def xmlRuns(xml: String, tag: String, blockEnd: String): String = {
    val open = "<" + tag
    val close = "</" + tag + ">"
    val out = new StringBuilder
    var i = 0
    while (i < xml.length) {
      if (xml.startsWith(blockEnd, i)) {
        out.append(' '); i += blockEnd.length
      } else if (xml.startsWith(open, i) &&
          (i + open.length < xml.length &&
            (xml.charAt(i + open.length) == '>' ||
              xml.charAt(i + open.length) == ' '))) {
        val c = xml.indexOf('>', i)
        if (c < 0) i = xml.length
        else {
          val e = xml.indexOf(close, c + 1)
          if (e < 0) i = xml.length
          else { out.append(xml.substring(c + 1, e)); i = e + close.length }
        }
      } else i += 1
    }
    val ent = out.toString
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
    ent.replaceAll("\\s+", " ").trim
  }

  /** Text of any OFFICE OOXML container in ONE streaming member walk:
    * WordprocessingML (`word/document.xml`, `<w:t>` runs) wins over
    * SpreadsheetML (`xl/sharedStrings.xml`, `<t>` cell strings, `</si>`
    * boundaries become spaces) over PresentationML (`ppt/slides/
    * slide*.xml` in name order, `<a:t>` runs) — a container declares at
    * most one of the three. '' routes out-of-engine, never a throw.
    */
  def officeText(bytes: Array[Byte]): String =
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var doc: String = null
      var shared: String = null
      val slides = scala.collection.mutable.TreeMap.empty[String, String]
      def readAll(): String = {
        val out = new java.io.ByteArrayOutputStream(8192)
        val buf = new Array[Byte](8192)
        var r = zin.read(buf)
        while (r >= 0) { out.write(buf, 0, r); r = zin.read(buf) }
        new String(out.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
      }
      var e = zin.getNextEntry
      while (e != null) {
        val n = e.getName
        if (n == "word/document.xml") doc = readAll()
        else if (n == "xl/sharedStrings.xml") shared = readAll()
        else if (n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
          slides += n -> readAll()
        e = zin.getNextEntry
      }
      zin.close()
      if (doc != null) xmlRuns(doc, "w:t", "</w:p>")
      else if (shared != null) xmlRuns(shared, "t", "</si>")
      else if (slides.nonEmpty)
        slides.values.map(xmlRuns(_, "a:t", "</a:p>"))
          .filter(_.nonEmpty).mkString(" ")
      else ""
    } catch { case _: Exception => "" }

  /** Deterministic minimal-XLSX fixture: `text` as two shared-string
    * cells (the `</si>` boundary decodes back to one space). The
    * [[docxFixture]] determinism discipline (pinned mtimes, fixed
    * deflate level).
    */
  def xlsxFixture(text: String): Array[Byte] = {
    val (p1, p2) = splitAtSpace(text)
    def esc(t: String): String =
      t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sst =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" count=\"2\" uniqueCount=\"2\">" +
        s"<si><t xml:space=\"preserve\">${esc(p1)}</t></si>" +
        s"<si><t xml:space=\"preserve\">${esc(p2)}</t></si></sst>"
    val ctXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
    zipOf(Seq("[Content_Types].xml" -> ctXml, "xl/sharedStrings.xml" -> sst))
  }

  /** Deterministic minimal-PPTX fixture: `text` across two slides'
    * `<a:t>` runs (slide boundary → space via the join).
    */
  def pptxFixture(text: String): Array[Byte] = {
    val (p1, p2) = splitAtSpace(text)
    def esc(t: String): String =
      t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def slide(body: String): String =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<p:sld xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\" " +
        "xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\">" +
        s"<p:cSld><p:spTree><p:sp><p:txBody><a:p><a:r><a:t>${esc(body)}" +
        "</a:t></a:r></a:p></p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    val ctXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
    zipOf(Seq("[Content_Types].xml" -> ctXml,
      "ppt/slides/slide1.xml" -> slide(p1),
      "ppt/slides/slide2.xml" -> slide(p2)))
  }

  /** The fixture split shared by every two-part container: the boundary
    * lands on a space so extraction round-trips the text exactly.
    */
  private def splitAtSpace(text: String): (String, String) = {
    val mid = text.lastIndexOf(' ', text.length / 2)
    if (mid <= 0) (text, "") else (text.substring(0, mid), text.substring(mid + 1))
  }

  /** Deterministic deflated zip of (name, utf-8 body) members — the
    * pinned-mtime discipline shared by the container fixtures.
    */
  private def zipOf(members: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(2048)
    val zout = new java.util.zip.ZipOutputStream(bos)
    zout.setLevel(6)
    members.foreach { case (name, body) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(1704067200000L)
      zout.putNextEntry(e)
      zout.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zout.closeEntry()
    }
    zout.close()
    bos.toByteArray
  }

  /** (doc_id, text) from a DOCX binary column — [[extractPdfText]]'s
    * sibling; '' text is the out-of-engine routing signal.
    */
  def extractDocxText(files: DataFrame, id: Column, content: Column): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val (keyed, idType) = Multimodal.keyedBytes(files, id, content)
    keyed.map { case (docId, bytes) => (docId, docxText(bytes)) }
      .toDF("doc_id", "text")
      .withColumn("doc_id", col("doc_id").cast(idType))
  }

  /** In-engine text for an arbitrary document blob, dispatched on the
    * MAGIC HEADER — never the served Content-Type, which real crawls
    * get wrong constantly: `%PDF-` → [[pdfText]], `PK` zip local header
    * → [[officeText]] (whichever of the WordprocessingML /
    * SpreadsheetML / PresentationML members the container carries),
    * `{\rtf` → [[rtfText]]. Every other format — and every
    * document the minimal pulls can't read — returns '', the explicit
    * route-out-of-engine signal (the U3 boundary); nothing here throws
    * on hostile bytes.
    */
  def documentText(bytes: Array[Byte]): String =
    documentText(bytes, unwrapGzip = true)

  private def documentText(bytes: Array[Byte], unwrapGzip: Boolean): String = {
    def at(i: Int, b: Int): Boolean =
      i < bytes.length && (bytes(i) & 0xff) == b
    if (at(0, '%') && at(1, 'P') && at(2, 'D') && at(3, 'F') && at(4, '-'))
      pdfText(bytes)
    else if (at(0, 'P') && at(1, 'K') && at(2, 3) && at(3, 4))
      officeText(bytes)
    else if (at(0, '{') && at(1, '\\') && at(2, 'r') && at(3, 't') &&
        at(4, 'f'))
      rtfText(bytes)
    else if (unwrapGzip && at(0, 0x1f) && at(1, 0x8b)) {
      // crawls serve `report.pdf.gz` and friends: unwrap ONE gzip layer
      // and re-dispatch on the inner magic. ONE layer only: gzip-in-
      // gzip is not a document.
      val inner = gunzipOnce(bytes)
      if (inner == null) "" else documentText(inner, unwrapGzip = false)
    } else ""
  }

  /** One bounded gzip unwrap, or null for non-gzip/corrupt input and
    * for payloads past the 256 MiB single-document bound (decompression
    * bombs route out — the P7 never-throw convention; a record is
    * already single-record resident upstream, so the bound is the
    * document policy, not a memory ceiling).
    */
  private def gunzipOnce(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f ||
        (bytes(1) & 0xff) != 0x8b) return null
    try {
      val gin = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(
        math.min(bytes.length.toLong * 4, 1 << 20).toInt)
      val buf = new Array[Byte](65536)
      var r = gin.read(buf)
      while (r >= 0) {
        out.write(buf, 0, r)
        if (out.size > (1 << 28)) return null
        r = gin.read(buf)
      }
      gin.close()
      out.toByteArray
    } catch { case _: Exception => null }
  }

  /** Destination groups whose content is formatting metadata, never
    * document text — `{\fonttbl …}`, `{\info …}`, `{\*\anything …}`.
    */
  private val rtfDestinations = Set("fonttbl", "colortbl", "stylesheet",
    "info", "pict", "header", "footer", "generator")

  /** Minimal RTF text pull: group-depth walk with destination-group
    * suppression, control-word parse (optional signed numeric argument,
    * one-space delimiter), `\'hh` hex and `\\ \{ \}` literal escapes,
    * `\uN` Unicode (negative = the RTF signed-16-bit encoding; ONE
    * fallback character consumed, the `\uc1` default), and
    * par/line/sect/page/tab/cell/row rendered as spaces. Raw newlines
    * are RTF file formatting, not content. Whitespace-collapsed like
    * every extractor here. Unknown control words are ignored — styling
    * is formatting, not text. Hostile input yields partial text or '',
    * never a throw.
    */
  def rtfText(bytes: Array[Byte]): String = {
    // RTF is 7-bit by design; 8-bit bytes only appear behind \'hh
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("{\\rtf")) return ""
    def isHex(c: Char): Boolean = c.isDigit ||
      ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')
    val out = new StringBuilder
    var depth = 0
    var skipAbove = Int.MaxValue // suppress while depth >= this
    def skipping: Boolean = depth >= skipAbove
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '{' =>
          depth += 1; i += 1
          if (i + 1 < s.length && s.charAt(i) == '\\' && !skipping) {
            if (s.charAt(i + 1) == '*') skipAbove = depth
            else {
              var j = i + 1
              while (j < s.length && s.charAt(j).isLetter) j += 1
              if (rtfDestinations.contains(s.substring(i + 1, j)))
                skipAbove = depth
            }
          }
        case '}' =>
          depth -= 1; i += 1
          if (depth < skipAbove) skipAbove = Int.MaxValue
        case '\\' if i + 1 < s.length =>
          val c1 = s.charAt(i + 1)
          if (c1 == '\'') {
            if (i + 3 < s.length && isHex(s.charAt(i + 2)) &&
                isHex(s.charAt(i + 3))) {
              if (!skipping) out.append(
                Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
              i += 4
            } else i += 2
          } else if (c1 == '\\' || c1 == '{' || c1 == '}') {
            if (!skipping) out.append(c1); i += 2
          } else if (c1 == '~') { if (!skipping) out.append(' '); i += 2 }
          else if (c1 == '_') { if (!skipping) out.append('-'); i += 2 }
          else if (c1.isLetter) {
            var j = i + 1
            while (j < s.length && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var k = j
            var neg = false
            if (k < s.length && s.charAt(k) == '-') { neg = true; k += 1 }
            var num = 0L
            var hasNum = false
            while (k < s.length && s.charAt(k).isDigit && num < 1000000L) {
              num = num * 10 + (s.charAt(k) - '0'); hasNum = true; k += 1
            }
            if (k < s.length && s.charAt(k) == ' ') k += 1 // delimiter
            if (!skipping) word match {
              case "par" | "line" | "sect" | "page" | "tab" | "cell" |
                   "row" => out.append(' ')
              case "u" if hasNum =>
                out.append((if (neg) 65536L - num else num).toChar)
                // consume the one-character ANSI fallback (\uc1 form);
                // it may itself be a \'hh escape
                if (k + 3 < s.length && s.charAt(k) == '\\' &&
                    s.charAt(k + 1) == '\'') k += 4
                else if (k < s.length && s.charAt(k) != '\\' &&
                    s.charAt(k) != '{' && s.charAt(k) != '}') k += 1
              case _ => ()
            }
            i = k
          } else i += 2 // unknown control symbol
        case '\r' | '\n' => i += 1 // file formatting, not content
        case ch =>
          if (!skipping) out.append(ch)
          i += 1
      }
    }
    out.toString.replaceAll("\\s+", " ").trim
  }

  /** Deterministic minimal-RTF fixture: font table + info destination
    * (both must be scrubbed), `text` across two `\par`-terminated runs,
    * RTF-escaped (`\\ \{ \}`, non-ASCII as signed `\uN?` with the
    * `\uc1` fallback, tabs/newlines as their control words).
    */
  def rtfFixture(text: String): Array[Byte] = {
    val mid = text.lastIndexOf(' ', text.length / 2)
    val (p1, p2) =
      if (mid <= 0) (text, "")
      else (text.substring(0, mid), text.substring(mid + 1))
    def esc(t: String): String = {
      val b = new StringBuilder
      t.foreach {
        case '\\' => b.append("\\\\")
        case '{' => b.append("\\{")
        case '}' => b.append("\\}")
        case '\t' => b.append("\\tab ")
        case '\n' => b.append("\\line ")
        case '\r' => b.append("\\line ") // whitespace, not droppable:
        // the extractor's collapse must see a break where one stood
        case ch if ch < 128 => b.append(ch)
        case ch =>
          val v = ch.toInt
          b.append("\\u").append(if (v > 32767) v - 65536 else v)
            .append('?')
      }
      b.toString
    }
    ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0\\froman Times New Roman;}}" +
      "{\\info{\\title fixture}}\\uc1\\f0\\fs24 " + esc(p1) +
      "\\par " + esc(p2) + "\\par}")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** (doc_id, text) over mixed-format document blobs — the
    * magic-dispatched union of [[extractPdfText]] and
    * [[extractDocxText]]; '' rows are the caller's routing signal.
    */
  def extractDocumentText(files: DataFrame, id: Column, content: Column): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val (keyed, idType) = Multimodal.keyedBytes(files, id, content)
    keyed.map { case (docId, bytes) => (docId, documentText(bytes)) }
      .toDF("doc_id", "text")
      .withColumn("doc_id", col("doc_id").cast(idType))
  }

  /** Concatenated XHTML payload of an EPUB container — '' unless the
    * zip declares `application/epub+zip` in its `mimetype` member (the
    * OCF signature; jars and office files also travel as zip and must
    * not be mistaken for books). Spine members (`.xhtml`/`.html`/
    * `.htm`) are joined in container order with a space. The HTML→text
    * stage is deliberately the CALLER's: the ingest chain applies its
    * configured extractor, so epub chapters get the same DOM-block
    * boilerplate treatment as any crawled page. One streaming
    * local-header walk; corrupt containers yield ''.
    */
  def epubHtml(bytes: Array[Byte]): String =
    try {
      // books travel gzipped too (book.epub.gz): one bounded unwrap,
      // then the container walk proper
      val b0 =
        if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
            (bytes(1) & 0xff) == 0x8b) gunzipOnce(bytes)
        else bytes
      if (b0 == null) return ""
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(b0))
      var isEpub = false
      var containerXml: String = null
      val opfs = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val htmls = scala.collection.mutable.LinkedHashMap.empty[String, String]
      def readAll(): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream(8192)
        val buf = new Array[Byte](8192)
        var r = zin.read(buf)
        while (r >= 0) { out.write(buf, 0, r); r = zin.read(buf) }
        out.toByteArray
      }
      def utf8(b: Array[Byte]): String =
        new String(b, java.nio.charset.StandardCharsets.UTF_8)
      var e = zin.getNextEntry
      while (e != null) {
        val n = e.getName
        if (n == "mimetype")
          isEpub = new String(readAll(),
            java.nio.charset.StandardCharsets.US_ASCII).trim ==
            "application/epub+zip"
        else if (n == "META-INF/container.xml") containerXml = utf8(readAll())
        else if (n.endsWith(".opf")) opfs += n -> utf8(readAll())
        else if (!e.isDirectory && (n.endsWith(".xhtml") ||
            n.endsWith(".html") || n.endsWith(".htm")))
          htmls += n -> utf8(readAll())
        e = zin.getNextEntry
      }
      zin.close()
      if (!isEpub) return ""
      // SPINE order, not container order: the OCF container.xml names
      // the OPF, whose manifest maps ids to hrefs and whose spine lists
      // the reading order — real books interleave front/back matter and
      // ship members in arbitrary zip order. Absent/corrupt packaging
      // degrades to container order (every chapter still read, order
      // best-effort — the P7 never-throw discipline).
      def attrOf(tag: String, name: String): Option[String] =
        ("(?s)" + name + "=\"([^\"]*)\"").r
          .findFirstMatchIn(tag).map(_.group(1))
      val opf = Option(containerXml)
        .flatMap("(?s)<rootfile\\s[^>]*>".r.findFirstIn(_))
        .flatMap(attrOf(_, "full-path")).flatMap(opfs.get)
        .orElse(opfs.values.headOption)
      val ordered = opf.map { o =>
        val opfDir = opfs.collectFirst {
          case (p, c) if c eq o => p.take(p.lastIndexOf('/') + 1)
        }.getOrElse("")
        val hrefById = "(?s)<item\\s[^>]*>".r.findAllIn(o).flatMap { it =>
          for (i <- attrOf(it, "id"); h <- attrOf(it, "href"))
            yield i -> (opfDir + h)
        }.toMap
        val spine = "(?s)<itemref\\s[^>]*>".r.findAllIn(o).toList
          .flatMap(attrOf(_, "idref")).flatMap(hrefById.get)
          .flatMap(htmls.get)
        if (spine.nonEmpty) spine else htmls.values.toList
      }.getOrElse(htmls.values.toList)
      ordered.mkString(" ")
    } catch { case _: Exception => "" }

  /** (doc_id, text) from an EPUB binary column: [[epubHtml]] spine
    * concatenation through the standard tag-level HTML extraction —
    * [[extractDocxText]]'s sibling for books; '' routes out-of-engine.
    */
  def extractEpubText(files: DataFrame, id: Column, content: Column): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val (keyed, idType) = Multimodal.keyedBytes(files, id, content)
    keyed.map { case (docId, bytes) => (docId, epubHtml(bytes)) }
      .toDF("doc_id", "html")
      .select(col("doc_id").cast(idType),
        graft.text.TextFunctions.extractHtmlText(col("html")).as("text"))
  }

  /** Deterministic minimal-EPUB fixture: OCF `mimetype` member (STORED,
    * per spec, with a precomputed CRC), META-INF/container.xml, a
    * minimal OPF, and `text` split across two XHTML chapters (the
    * [[docxFixture]] split — the boundary decodes back to one space).
    * Pinned entry mtimes + fixed deflate level → byte-identical
    * containers for identical text.
    */
  def epubFixture(text: String): Array[Byte] = {
    val mid = text.lastIndexOf(' ', text.length / 2)
    val (p1, p2) =
      if (mid <= 0) (text, "")
      else (text.substring(0, mid), text.substring(mid + 1))
    def esc(t: String): String =
      t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def chapter(title: String, body: String): String =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
        "<html xmlns=\"http://www.w3.org/1999/xhtml\">" +
        s"<head><title>$title</title></head>" +
        s"<body><p>${esc(body)}</p></body></html>"
    val containerXml =
      "<?xml version=\"1.0\"?><container version=\"1.0\" " +
        "xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\">" +
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
        "media-type=\"application/oebps-package+xml\"/></rootfiles>" +
        "</container>"
    val opf =
      "<?xml version=\"1.0\"?><package version=\"3.0\" " +
        "xmlns=\"http://www.idpf.org/2007/opf\"><manifest>" +
        "<item id=\"c1\" href=\"ch1.xhtml\" media-type=\"application/xhtml+xml\"/>" +
        "<item id=\"c2\" href=\"ch2.xhtml\" media-type=\"application/xhtml+xml\"/>" +
        "</manifest><spine><itemref idref=\"c1\"/><itemref idref=\"c2\"/>" +
        "</spine></package>"
    val bos = new java.io.ByteArrayOutputStream(2048)
    val zout = new java.util.zip.ZipOutputStream(bos)
    zout.setLevel(6)
    val mt = "application/epub+zip".getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    val mte = new java.util.zip.ZipEntry("mimetype")
    mte.setTime(1704067200000L)
    mte.setMethod(java.util.zip.ZipOutputStream.STORED)
    mte.setSize(mt.length.toLong)
    val crc = new java.util.zip.CRC32
    crc.update(mt)
    mte.setCrc(crc.getValue)
    zout.putNextEntry(mte)
    zout.write(mt)
    zout.closeEntry()
    def put(name: String, body: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(1704067200000L)
      zout.putNextEntry(e)
      zout.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zout.closeEntry()
    }
    put("META-INF/container.xml", containerXml)
    put("OEBPS/content.opf", opf)
    put("OEBPS/ch1.xhtml", chapter("One", p1))
    put("OEBPS/ch2.xhtml", chapter("Two", p2))
    zout.close()
    bos.toByteArray
  }

  /** Deterministic minimal-DOCX fixture: [Content_Types].xml +
    * word/document.xml with `text` split into two runs across two
    * paragraphs. Entry timestamps pinned (zip headers embed mtimes —
    * `new Date()` there would make fixture bytes nondeterministic) and
    * a fixed deflate level, so same text → byte-identical container.
    */
  def docxFixture(text: String): Array[Byte] = {
    // paragraph split lands on a SPACE (the paragraph boundary decodes
    // back to exactly one space, so extraction round-trips the text);
    // spaceless text stays one paragraph
    val mid = text.lastIndexOf(' ', text.length / 2)
    val (p1, p2) =
      if (mid <= 0) (text, "")
      else (text.substring(0, mid), text.substring(mid + 1))
    def esc(t: String): String =
      t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val docXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\">" +
        s"<w:body><w:p><w:r><w:t xml:space=\"preserve\">${esc(p1)}</w:t>" +
        s"</w:r></w:p><w:p><w:r><w:t xml:space=\"preserve\">${esc(p2)}</w:t>" +
        "</w:r></w:p></w:body></w:document>"
    val ctXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>" +
        "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
        "<Default Extension=\"xml\" ContentType=\"application/xml\"/></Types>"
    val bos = new java.io.ByteArrayOutputStream(1024)
    val zout = new java.util.zip.ZipOutputStream(bos)
    zout.setLevel(6)
    def put(name: String, body: String): Unit = {
      val e = new java.util.zip.ZipEntry(name)
      e.setTime(1704067200000L) // 2024-01-01T00:00:00Z, pinned
      zout.putNextEntry(e)
      zout.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      zout.closeEntry()
    }
    put("[Content_Types].xml", ctXml)
    put("word/document.xml", docXml)
    zout.close()
    bos.toByteArray
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
