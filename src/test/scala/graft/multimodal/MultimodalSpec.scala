package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  /** A minimal real PNG header (magic + IHDR) for width=640, height=480. */
  private def pngBytes(w: Int, h: Int, pad: Int = 8): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 + pad)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    bb.put(Array.fill(pad)(0x42.toByte))
    bb.array()
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("mmfiles")
    Files.write(d.resolve("a.png"), pngBytes(640, 480))
    Files.write(d.resolve("b.png"), pngBytes(1024, 768))
    Files.write(d.resolve("c.txt"), "not an image".getBytes)
    d.toString
  }

  test("binaryFile source lists files with length+content, glob-filtered") {
    val all = Multimodal.binarySource(spark, dir)
    assert(all.count() === 3)
    val pngs = Multimodal.binarySource(spark, dir, "*.png")
    assert(pngs.count() === 2)
    val row = pngs.filter(col("path").endsWith("a.png")).head()
    assert(row.getAs[Long]("length") === 32L)
  }

  test("metadata-only query prunes the content column from the scan") {
    val plan = Multimodal.binarySource(spark, dir, "*.png")
      .select("path", "length").queryExecution.executedPlan.toString
    assert(!plan.contains("content"),
      s"content column should be pruned from a metadata-only scan:\n$plan")
  }

  test("magic sniff + PNG dimension parse work on real file bytes") {
    val files = Multimodal.binarySource(spark, dir)
    val got = files.select(
        element_at(split(col("path"), "/"), -1).as("name"),
        Multimodal.magicFormat(col("content")).as("fmt"),
        Multimodal.pngWidth(col("content")).as("w"),
        Multimodal.pngHeight(col("content")).as("h"))
      .as[(String, String, Option[Int], Option[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a.png") === (("png", Some(640), Some(480))))
    assert(got("b.png") === (("png", Some(1024), Some(768))))
    assert(got("c.txt")._1 === "unknown")
  }

  test("pngHeader round-trips through the parser for arbitrary dims") {
    val df = Seq((1, 33), (4095, 2000), (65535, 1)).toDF("w", "h")
    val got = df.select(
        Multimodal.pngWidth(Multimodal.pngHeader(col("w"), col("h"))).as("w2"),
        Multimodal.pngHeight(Multimodal.pngHeader(col("w"), col("h"))).as("h2"))
      .as[(Int, Int)].collect().toSeq
    assert(got === Seq((1, 33), (4095, 2000), (65535, 1)))
  }

  /** A REAL (fully decodable) PNG with known pixel values, written by the
    * JDK encoder itself.
    */
  private def realPng(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImages decodes real pixels: exact dims and Rec.601 mean luma") {
    val d = Files.createTempDirectory("realpng")
    // all-white 6x4 → luma 1.0; constant (100,100,100) gray 3x5 → 100/255
    Files.write(d.resolve("white.png"), realPng(6, 4)((_, _) => 0xffffff))
    Files.write(d.resolve("gray.png"), realPng(3, 5)((_, _) => 0x646464))
    // half black / half white columns 8x2 → mean luma 0.5
    Files.write(d.resolve("half.png"),
      realPng(8, 2)((x, _) => if (x < 4) 0x000000 else 0xffffff))
    Files.write(d.resolve("junk.png"), "not an image at all".getBytes)
    val got = Multimodal.decodeImages(
        Multimodal.binarySource(spark, d.toString, "*.png"))
      .collect().map(r => r.path.split("/").last -> r).toMap
    assert(got("white.png").width === 6 && got("white.png").height === 4)
    assert(got("white.png").format === "png")
    assert(got("white.png").meanLuma === 1.0)
    assert(math.abs(got("gray.png").meanLuma - 100.0 / 255.0) < 1e-6)
    assert(got("half.png").meanLuma === 0.5)
    // corrupt payload: no throw, zero dims, sniffed format
    assert(got("junk.png") ===
      Multimodal.DecodedImage(got("junk.png").path, 0, 0, "unknown", 0.0))
  }

  test("bmpImage builds a complete BMP the real codec decodes (u1d fixture)") {
    val df = Seq((11, 3, 0), (4, 7, 255), (5, 2, 77)).toDF("w", "h", "g")
      .select(col("w"), col("h"), col("g"),
        Multimodal.bmpImage(col("w"), col("h"), col("g")).as("content"))
    // header parsers agree with the generator
    val hdr = df.select(
        Multimodal.magicFormat(col("content")),
        Multimodal.bmpWidth(col("content")),
        Multimodal.bmpHeight(col("content")))
      .as[(String, Int, Int)].collect().toSet
    assert(hdr === Set(("bmp", 11, 3), ("bmp", 4, 7), ("bmp", 5, 2)))
    // the REAL codec decodes it and sees the constant gray level exactly
    val dec = Multimodal.decodeImages(
        df.select(col("g").cast("string").as("path"), col("content")))
      .collect().map(r => r.path.toInt -> r).toMap
    assert(dec(0).width === 11 && dec(0).height === 3 && dec(0).meanLuma === 0.0)
    assert(dec(255).width === 4 && dec(255).height === 7 && dec(255).meanLuma === 1.0)
    assert(dec(77).width === 5 && dec(77).height === 2 &&
      math.abs(dec(77).meanLuma - 77.0 / 255.0) < 1e-6)
  }

  test("bmpImageRows: visual row order is top-down through the real codec (d13 fixture)") {
    // rows [10, 200, 30]: BMP serializes bottom-up, so a row-order bug
    // would decode as [30, 200, 10] — pin the exact per-row pixel values
    val df = Seq(1).toDF("k").select(
      Multimodal.bmpImageRows(lit(4), array(lit(10), lit(200), lit(30)))
        .as("content"))
    val bytes = df.as[Array[Byte]].head()
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth === 4 && img.getHeight === 3)
    def gray(r: Int): Int = img.getRGB(0, r) & 0xff
    assert((0 until 3).map(gray) === Seq(10, 200, 30))
    // and every pixel of a row carries the row's gray
    assert((0 until 4).forall(c => (img.getRGB(c, 1) & 0xff) === 200))
  }

  test("DocFormats: router tags document/archive blobs; pdfText reads plain and FlateDecode streams, never throws") {
    import graft.multimodal.DocFormats
    // plain vs flate fixtures extract identical text
    val text = "Quarterly results (draft) improved 12% over baseline."
    val plain = DocFormats.pdfText(DocFormats.pdfFixture(text, flate = false))
    val flate = DocFormats.pdfText(DocFormats.pdfFixture(text, flate = true))
    assert(plain === text && flate === text)
    // escapes round-trip through the PDF string syntax
    val esc = "parens (nested) and back\\slash"
    assert(DocFormats.pdfText(DocFormats.pdfFixture(esc, flate = false)) === esc)
    // non-PDF, truncated, and corrupt-flate inputs yield "" (never throw)
    assert(DocFormats.pdfText("not a pdf".getBytes) === "")
    assert(DocFormats.pdfText(
      DocFormats.pdfFixture(text, flate = false).take(40)) === "")
    val corrupt = DocFormats.pdfFixture(text, flate = true)
      .zipWithIndex.map { case (b, i) =>
        if (i > 200 && i < 220) (b ^ 0x5a).toByte else b }
    DocFormats.pdfText(corrupt) // must not throw
    // router families over real fixture bytes
    val rows = Seq(
      (1L, DocFormats.pdfFixture(text, flate = true)),
      (2L, "PK\u0003\u0004rest".getBytes("ISO-8859-1")),
      (3L, "{\\rtf1 hi".getBytes("ISO-8859-1")),
      (4L, "YUV4MPEG2 W2 H2".getBytes("ISO-8859-1")),
      (5L, Array[Byte](0x1f, 0x8b.toByte, 8, 0)),
      (6L, "plain prose".getBytes("ISO-8859-1")))
      .toDF("doc_id", "content")
    val got = DocFormats.routeFormats(rows, col("doc_id"), col("content"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "pdf", "document"), (2L, "zip", "archive"),
      (3L, "rtf", "document"), (4L, "y4m", "video"),
      (5L, "gzip", "archive"), (6L, "unknown", "unknown")))
  }

  test("DocFormats zip/docx: member walk streams, docx text round-trips incl. entities, corrupt input never throws") {
    import graft.multimodal.DocFormats
    val text = "Terms & conditions apply to <all> pending \"renewals\" today."
    val docx = DocFormats.docxFixture(text)
    // the container routes as zip and lists exactly its two members
    val rows = Seq((7L, docx)).toDF("doc_id", "content")
    assert(DocFormats.routeFormats(rows, col("doc_id"), col("content"))
      .as[(Long, String, String)].head() === ((7L, "zip", "archive")))
    val members = DocFormats.zipMembers(rows, col("doc_id"), col("content"))
      .as[(Long, String, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(members.keySet === Set("[Content_Types].xml", "word/document.xml"))
    assert(members.values.forall(_ > 0))
    // extraction round-trips the text, XML entities decoded
    assert(DocFormats.docxText(docx) === text)
    // determinism: same text -> byte-identical container (pinned mtimes)
    assert(DocFormats.docxFixture(text).toSeq === docx.toSeq)
    // spaceless text stays one paragraph and round-trips
    assert(DocFormats.docxText(DocFormats.docxFixture("unbroken")) === "unbroken")
    // corrupt zip / non-docx zip yield empty, never throw
    assert(DocFormats.docxText("PKjunk".getBytes("ISO-8859-1")) === "")
    assert(DocFormats.zipMembers(
      Seq((1L, "PKjunk".getBytes("ISO-8859-1"))).toDF("doc_id", "content"),
      col("doc_id"), col("content")).count() === 0L)
  }

  test("DocFormats.documentText: magic-dispatched pdf/docx pull; non-documents and unreadable blobs yield ''") {
    import graft.multimodal.DocFormats
    val text = "Quarterly totals exceed plan & forecast."
    assert(DocFormats.documentText(
      DocFormats.pdfFixture(text, flate = true)) === text)
    assert(DocFormats.documentText(
      DocFormats.pdfFixture(text, flate = false)) === text)
    assert(DocFormats.documentText(DocFormats.docxFixture(text)) === text)
    // a zip that is not WordprocessingML routes out ('' — no throw)
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    val ze = new java.util.zip.ZipEntry("data.txt"); ze.setTime(0L)
    zo.putNextEntry(ze); zo.write("plain".getBytes("UTF-8"))
    zo.closeEntry(); zo.close()
    assert(DocFormats.documentText(bos.toByteArray) === "")
    // non-document magics and hostile bytes
    assert(DocFormats.documentText("GIF89a....".getBytes("ISO-8859-1")) === "")
    assert(DocFormats.documentText(Array[Byte]()) === "")
    assert(DocFormats.documentText("%PDF-corrupt".getBytes("UTF-8")) === "")
  }

  test("DocFormats epub: OCF-signed containers round-trip chapter text; head titles scrubbed; zip-without-signature routes out") {
    import graft.multimodal.DocFormats
    val text = "The study of distributed joins & shuffles, at length."
    val epub = DocFormats.epubFixture(text)
    // raw spine concatenation carries both chapters' markup
    val html = DocFormats.epubHtml(epub)
    assert(html.contains("<p>") && html.contains("xhtml"))
    // through the standard extraction: text round-trips, no <title> leak
    val got = DocFormats.extractEpubText(
      Seq((3L, epub)).toDF("doc_id", "content"),
      col("doc_id"), col("content")).as[(Long, String)].head()
    assert(got === ((3L, text)))
    assert(!got._2.contains("One") && !got._2.contains("Two"))
    // determinism (pinned mtimes, STORED mimetype with precomputed CRC)
    assert(DocFormats.epubFixture(text).toSeq === epub.toSeq)
    // a docx (zip without the OCF signature) is NOT a book
    assert(DocFormats.epubHtml(DocFormats.docxFixture(text)) === "")
    // hostile bytes yield '', never a throw
    assert(DocFormats.epubHtml("PKjunk".getBytes("ISO-8859-1")) === "")
  }

  test("DocFormats rtf: destinations scrubbed, escapes and signed \\uN decode, hostile input never throws") {
    import graft.multimodal.DocFormats
    val text = "Budget {draft} 100% \\ final today, truly"
    val rtf = DocFormats.rtfFixture(text)
    assert(DocFormats.documentText(rtf) === text)
    // fonttbl/info destination content never leaks
    assert(!DocFormats.rtfText(rtf).contains("Times") &&
      !DocFormats.rtfText(rtf).contains("fixture"))
    // non-ASCII round-trips through signed \uN (incl. the >32767 wrap
    // and an astral pair), fallback chars consumed
    val uni = "café ￥ price 😀 ok"
    assert(DocFormats.documentText(DocFormats.rtfFixture(uni)) === uni)
    // hex escapes and literal control-word text parse
    assert(DocFormats.rtfText(
      "{\\rtf1 a\\'e9b \\tab c\\par}".getBytes("ISO-8859-1")) ===
      "aéb c")
    // \*-destinations are skipped wholesale
    assert(DocFormats.rtfText(
      "{\\rtf1{\\*\\secret hidden}shown\\par}".getBytes("ISO-8859-1")) ===
      "shown")
    // non-rtf and truncated input: '' / partial, never a throw
    assert(DocFormats.rtfText("plain".getBytes("ISO-8859-1")) === "")
    assert(DocFormats.rtfText("{\\rtf1 ab\\".getBytes("ISO-8859-1")) ===
      "ab\\")
  }

  test("DocFormats office: one walk dispatches docx/xlsx/pptx; cell and slide boundaries become spaces; entities decode") {
    import graft.multimodal.DocFormats
    val text = "Revenue & costs <net> for \"Q3\" by region and more"
    assert(DocFormats.officeText(DocFormats.docxFixture(text)) === text)
    assert(DocFormats.officeText(DocFormats.xlsxFixture(text)) === text)
    assert(DocFormats.officeText(DocFormats.pptxFixture(text)) === text)
    // documentText routes all three through the zip magic
    assert(DocFormats.documentText(DocFormats.xlsxFixture(text)) === text)
    assert(DocFormats.documentText(DocFormats.pptxFixture(text)) === text)
    // determinism of the new fixtures
    assert(DocFormats.xlsxFixture(text).toSeq ===
      DocFormats.xlsxFixture(text).toSeq)
    assert(DocFormats.pptxFixture(text).toSeq ===
      DocFormats.pptxFixture(text).toSeq)
    // a zip with none of the three parts routes out
    assert(DocFormats.officeText("PKjunk".getBytes("ISO-8859-1")) === "")
  }

  test("epub spine order wins over zip member order; gzip-wrapped documents unwrap and re-dispatch") {
    import graft.multimodal.DocFormats
    // hand-built epub: chapters stored REVERSED in the zip, OPF spine
    // says ch1 then ch2 — extraction must follow the spine
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    val mt = "application/epub+zip".getBytes("US-ASCII")
    val mte = new java.util.zip.ZipEntry("mimetype")
    mte.setMethod(java.util.zip.ZipOutputStream.STORED)
    mte.setSize(mt.length.toLong)
    val crc = new java.util.zip.CRC32; crc.update(mt); mte.setCrc(crc.getValue)
    zo.putNextEntry(mte); zo.write(mt); zo.closeEntry()
    def put(n: String, b: String): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(n))
      zo.write(b.getBytes("UTF-8")); zo.closeEntry()
    }
    put("OEBPS/zz_later.xhtml", "<html><body><p>second part</p></body></html>")
    put("OEBPS/aa_first.xhtml", "<html><body><p>first part</p></body></html>")
    put("META-INF/container.xml",
      "<container><rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
        "media-type=\"application/oebps-package+xml\"/></rootfiles></container>")
    put("OEBPS/content.opf",
      "<package><manifest>" +
        "<item id=\"c1\" href=\"aa_first.xhtml\" media-type=\"application/xhtml+xml\"/>" +
        "<item id=\"c2\" href=\"zz_later.xhtml\" media-type=\"application/xhtml+xml\"/>" +
        "</manifest><spine><itemref idref=\"c1\"/><itemref idref=\"c2\"/></spine></package>")
    zo.close()
    val html = DocFormats.epubHtml(bos.toByteArray)
    assert(html.indexOf("first part") < html.indexOf("second part"), html)
    // the standard fixture (packaged in order) still round-trips
    val t = "chapters read in the order the spine declares them"
    assert(DocFormats.epubHtml(DocFormats.epubFixture(t)).contains("<p>"))
    // gzip-wrapped pdf/docx unwrap one layer and re-dispatch
    def gz(b: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(b); g.close(); o.toByteArray
    }
    val txt = "compressed report body for the gzip path"
    assert(DocFormats.documentText(
      gz(DocFormats.pdfFixture(txt, flate = true))) === txt)
    assert(DocFormats.documentText(gz(DocFormats.docxFixture(txt))) === txt)
    // a gzipped BOOK unwraps too: epubHtml sees through one layer
    assert(DocFormats.epubHtml(gz(DocFormats.epubFixture(txt)))
      .contains("<p>"))
    // gzip-of-gzip and gzip-of-noise route out, never throw
    assert(DocFormats.documentText(gz(gz(DocFormats.docxFixture(txt)))) === "")
    assert(DocFormats.documentText(gz("just text".getBytes("UTF-8"))) === "")
    assert(DocFormats.documentText(
      Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3)) === "")
  }

  test("container fixtures round-trip arbitrary text through documentText (ScalaCheck, docx/xlsx/pptx/rtf + Latin-1 pdf)") {
    import graft.multimodal.DocFormats
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // pieces stress every escape path: XML entities, RTF control chars,
    // whitespace variants, CJK, accents, an astral pair
    val piece = Gen.oneOf("word", "a1", "&", "<tag>", "\"q\"", "'", "{",
      "}", "\\", "(", ")", " ", "\t", "\n", "\r\n", "café", "漢字",
      "デー", "😀", ".", ",")
    val textGen = Gen.listOf(piece).map(_.mkString)
    def norm(t: String): String = t.replaceAll("\\s+", " ").trim
    val prop = Prop.forAll(textGen) { t =>
      val e = norm(t)
      DocFormats.documentText(DocFormats.docxFixture(t)) == e &&
        DocFormats.documentText(DocFormats.xlsxFixture(t)) == e &&
        DocFormats.documentText(DocFormats.pptxFixture(t)) == e &&
        DocFormats.documentText(DocFormats.rtfFixture(t)) == e
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
    // the PDF writer is Latin-1 (PDF string operands are byte strings);
    // its property holds on the Latin-1 alphabet incl. paren nesting
    val latin = Gen.listOf(Gen.oneOf("word", "a1", "(", ")", "((x))",
      "\\", " ", "\t", "café", ".")).map(_.mkString)
    val pdfProp = Prop.forAll(latin, Gen.oneOf(true, false)) { (t, flate) =>
      DocFormats.documentText(DocFormats.pdfFixture(t, flate)) == norm(t)
    }
    val pdfRes = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), pdfProp)
    assert(pdfRes.passed, pdfRes.status.toString)
  }

  test("imageDHashById: gradient bits from real pixels; block-average and short-image paths") {
    // strictly decreasing 4-row profile at h == grid: bits 0..2 set (each
    // bin > its successor), wrap bit 3 clear (row 3 < row 0) → fp = 7
    val grid4 = Seq((1L, Seq(200, 150, 100, 50))).toDF("doc_id", "grays")
      .select(col("doc_id"),
        Multimodal.bmpImageRows(lit(5), col("grays")).as("content"))
    val fp4 = Multimodal.imageDHashById(grid4, col("doc_id"), col("content"), 4)
      .select("doc_id", "width", "height", "dhash")
      .as[(Long, Int, Int, Long)].head()
    assert(fp4 === ((1L, 5, 4, 7L)))
    // h = 2×grid: block-average halves the rows first — averages
    // (175, 75) keep the same gradient signs as the 4-row case above
    val grid8 = Seq((2L, Seq(200, 150, 100, 50))).toDF("doc_id", "grays")
      .select(col("doc_id"),
        Multimodal.bmpImageRows(lit(5),
          flatten(transform(col("grays"), g => array(g, g)))).as("content"))
    val fp8 = Multimodal.imageDHashById(grid8, col("doc_id"), col("content"), 4)
      .select("dhash").as[Long].head()
    assert(fp8 === 7L)
    // h < grid: nearest-row sampling (2 rows into a 4-bin grid: rows
    // [200, 50] sample to bins [200, 200, 50, 50] → only bit 1 set)
    val short = Seq((3L, 1)).toDF("doc_id", "k")
      .select(col("doc_id"),
        Multimodal.bmpImageRows(lit(5), array(lit(200), lit(50))).as("content"))
    val fpS = Multimodal.imageDHashById(short, col("doc_id"), col("content"), 4)
      .select("dhash").as[Long].head()
    assert(fpS === (1L << 1))
    // near-dup property: one row nudged slightly flips no gradient sign —
    // identical fingerprint; a reversed gradient is far away
    val trio = Seq(
      (10L, Seq(200, 150, 100, 50)), (11L, Seq(198, 150, 100, 50)),
      (12L, Seq(50, 100, 150, 200)))
      .toDF("doc_id", "grays")
      .select(col("doc_id"),
        Multimodal.bmpImageRows(lit(5), col("grays")).as("content"))
    val fps = Multimodal.imageDHashById(trio, col("doc_id"), col("content"), 4)
      .select("doc_id", "dhash").as[(Long, Long)].collect().toMap
    assert(fps(10L) === fps(11L))
    assert(java.lang.Long.bitCount(fps(10L) ^ fps(12L)) >= 3)
    // undecodable payloads are dropped, not thrown
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "content")
    assert(Multimodal.imageDHashById(junk, col("doc_id"), col("content"), 4)
      .count() === 0)
  }

  test("audioFingerprintById: energy-gradient bits from real PCM; mix, gain, and short-clip paths") {
    def wav(docId: Long, samples: Seq[Int], channels: Int = 1) =
      Seq((docId, samples)).toDF("doc_id", "s")
        .select(col("doc_id"), Multimodal.wavPcm16(lit(8000), lit(channels),
          transform(col("s"), x => x.cast("int"))).as("content"))
    def fp(df: org.apache.spark.sql.DataFrame, frames: Int = 4): Long =
      Multimodal.audioFingerprintById(df, col("doc_id"), col("content"), frames)
        .select("afp").as[Long].head()
    // identity regime (n == frames): envelope [200,150,100,50] → bits
    // 200>150, 150>100, 100>50, !(50>200) = 0b0111, same as the image twin
    assert(fp(wav(1L, Seq(200, 150, 100, 50))) === 7L)
    // |amplitude|: a negative sample has the same energy
    assert(fp(wav(2L, Seq(-200, 150, -100, 50))) === 7L)
    // uniform gain shift preserves every gradient sign → identical fp
    assert(fp(wav(3L, Seq(400, 300, 200, 100))) === 7L)
    // block-average regime (n = 2×frames): pairs average to the same
    // envelope
    assert(fp(wav(4L, Seq(210, 190, 160, 140, 110, 90, 60, 40))) === 7L)
    // short clip (n < frames): nearest-sample upsampling — [200, 50]
    // into 4 bins = [200, 200, 50, 50] → only bit 1 set
    assert(fp(wav(5L, Seq(200, 50))) === (1L << 1))
    // stereo mix: (L, R) = (a±Δ) pairs mono-mix to |a| — equal to the
    // mono fingerprint
    assert(fp(wav(6L, Seq(220, 180, 170, 130, 120, 80, 70, 30),
      channels = 2)) === 7L)
    // metadata rides along: sample_rate + per-channel frame count
    val meta = Multimodal.audioFingerprintById(
      wav(7L, Seq(1, 2, 3, 4), channels = 2), col("doc_id"), col("content"), 2)
      .select("sample_rate", "n_samples").as[(Int, Int)].head()
    assert(meta === ((8000, 2)))
    // undecodable payloads are dropped, not thrown
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "content")
    assert(Multimodal.audioFingerprintById(junk, col("doc_id"), col("content"), 4)
      .count() === 0)
    // near-dup property through the banding machinery: a nudged copy
    // fingerprints identically (Hamming 0), a reversed envelope is far
    val trio = Seq(
      (10L, Seq(200, 150, 100, 50)), (11L, Seq(202, 150, 100, 50)),
      (12L, Seq(50, 100, 150, 200))).toDF("doc_id", "s")
      .select(col("doc_id"), Multimodal.wavPcm16(lit(8000), lit(1),
        transform(col("s"), x => x.cast("int"))).as("content"))
    val hashes = Multimodal.audioFingerprintById(trio, col("doc_id"),
      col("content"), 4)
    val pairs = graft.dedup.Dedup.imageNearDupPairs(hashes, col("doc_id"),
      col("afp"), bits = 4, bandBits = 2, maxHamming = 1)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSet === Set((10L, 11L, 0)))
  }

  test("videoFingerprintById: temporal-gradient bits from really demuxed frames") {
    def vid(docId: Long, lumas: Seq[Int], w: Int = 4, h: Int = 3) =
      Seq((docId, lumas)).toDF("doc_id", "l")
        .select(col("doc_id"), Multimodal.y4mVideo(lit(w), lit(h),
          col("l")).as("content"))
    def fp(df: org.apache.spark.sql.DataFrame, frames: Int = 4): Long =
      Multimodal.videoFingerprintById(df, col("doc_id"), col("content"), frames)
        .select("vfp").as[Long].head()
    // identity regime (n == gridFrames): luma sequence [200,150,100,50] →
    // bits 200>150, 150>100, 100>50, !(50>200) = 0b0111 — the image/audio
    // twins' canonical case
    assert(fp(vid(1L, Seq(200, 150, 100, 50))) === 7L)
    // uniform brightness shift preserves every gradient sign → identical
    // fp (the property that makes it a near-dup detector)
    assert(fp(vid(2L, Seq(210, 160, 110, 60))) === 7L)
    // block-average regime (n = 2×gridFrames): frame pairs average to the
    // same temporal envelope
    assert(fp(vid(3L, Seq(210, 190, 160, 140, 110, 90, 60, 40))) === 7L)
    // short clip (n < gridFrames): nearest-frame upsampling — [200, 50]
    // into 4 bins = [200, 200, 50, 50] → only bit 1 set
    assert(fp(vid(4L, Seq(200, 50))) === (1L << 1))
    // metadata rides along: real demuxed geometry + frame count
    val meta = Multimodal.videoFingerprintById(
      vid(5L, Seq(9, 8, 7), w = 6, h = 2), col("doc_id"), col("content"), 2)
      .select("width", "height", "n_frames").as[(Int, Int, Int)].head()
    assert(meta === ((6, 2, 3)))
    // undecodable payloads are dropped, not thrown
    val junk = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "content")
    assert(Multimodal.videoFingerprintById(junk, col("doc_id"), col("content"), 4)
      .count() === 0)
    // near-dup property through the banding machinery: a re-graded copy
    // (uniform +2 luma) fingerprints identically, a reversed sequence is far
    val trio = Seq(
      (10L, Seq(200, 150, 100, 50)), (11L, Seq(202, 152, 102, 52)),
      (12L, Seq(50, 100, 150, 200))).toDF("doc_id", "l")
      .select(col("doc_id"), Multimodal.y4mVideo(lit(4), lit(3),
        col("l")).as("content"))
    val hashes = Multimodal.videoFingerprintById(trio, col("doc_id"),
      col("content"), 4)
    val pairs = graft.dedup.Dedup.imageNearDupPairs(hashes, col("doc_id"),
      col("vfp"), bits = 4, bandBits = 2, maxHamming = 1)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.toSet === Set((10L, 11L, 0)))
  }

  test("resizeImages rescales through the real codec and re-encodes losslessly") {
    // constant-gray source: bilinear rescale of a constant image is the
    // same constant, so the resized PNG must decode to the exact gray luma
    val src = Seq((11, 3, 77)).toDF("w", "h", "g")
      .select(lit("img77").as("path"),
        Multimodal.bmpImage(col("w"), col("h"), col("g")).as("content"))
    val resized = Multimodal.resizeImages(src, 5, 4).toDF()
    val back = Multimodal.decodeImages(resized, "path", "png").collect()
    assert(back.length === 1)
    assert(back.head.width === 5 && back.head.height === 4)
    assert(back.head.format === "png")
    assert(math.abs(back.head.meanLuma - 77.0 / 255.0) < 1e-6)
    // undecodable payloads are dropped, not failed
    val junk = Seq(("bad", "not an image".getBytes)).toDF("path", "content")
    assert(Multimodal.resizeImages(junk, 5, 4).count() === 0)
  }

  test("imageFeatures: luma histogram from real pixels, exact bin counts") {
    val d = Files.createTempDirectory("feat")
    // 8x2 half black / half white: 8 px in bin 0, 8 px in bin 7
    Files.write(d.resolve("half.png"),
      realPng(8, 2)((x, _) => if (x < 4) 0x000000 else 0xffffff))
    Files.write(d.resolve("junk.png"), "nope".getBytes)
    val got = Multimodal.imageFeatures(
        Multimodal.binarySource(spark, d.toString, "*.png"), bins = 8)
      .collect().map(r => r.path.split("/").last -> r).toMap
    assert(got.size === 1) // junk dropped
    val h = got("half.png")
    assert(h.width === 8 && h.height === 2)
    assert(h.lumaHist.toSeq === Seq(8L, 0L, 0L, 0L, 0L, 0L, 0L, 8L))
  }

  test("decodeNpy parses real npy v1 float32/float64 files (S6)") {
    def npyBytes(values: Seq[Float], dtype: String): Array[Byte] = {
      val headerDict =
        s"{'descr': '$dtype', 'fortran_order': False, 'shape': (${values.length},), }"
      val pad = 64 - ((10 + headerDict.length + 1) % 64)
      val header = headerDict + " " * pad + "\n"
      val bb = java.nio.ByteBuffer
        .allocate(10 + header.length + values.length * (if (dtype == "<f4") 4 else 8))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(Array(0x93, 'N', 'U', 'M', 'P', 'Y').map(_.toByte))
        .put(1.toByte).put(0.toByte)
        .putShort(header.length.toShort)
        .put(header.getBytes("ASCII"))
      if (dtype == "<f4") values.foreach(bb.putFloat)
      else values.foreach(v => bb.putDouble(v.toDouble))
      bb.array()
    }
    val d = Files.createTempDirectory("npy")
    Files.write(d.resolve("pose32.npy"), npyBytes(Seq(1.5f, -2.25f, 3f), "<f4"))
    Files.write(d.resolve("pose64.npy"), npyBytes(Seq(0.5f, 4f), "<f8"))
    Files.write(d.resolve("bad.npy"), "not numpy".getBytes)
    val got = Multimodal.decodeNpy(
        Multimodal.binarySource(spark, d.toString, "*.npy"))
      .collect().map { case (p, a) => p.split("/").last -> a.toSeq }.toMap
    assert(got("pose32.npy") === Seq(1.5f, -2.25f, 3f))
    assert(got("pose64.npy") === Seq(0.5f, 4f))
    assert(got("bad.npy") === Seq.empty)
  }

  test("sampleFrames fans each file out to strided frame rows (U1 video edge)") {
    val d = Files.createTempDirectory("vid")
    Files.write(d.resolve("clip.bin"), Array.fill(10 * 4096)(7.toByte))
    Files.write(d.resolve("tiny.bin"), Array[Byte](1, 2, 3))
    val frames = Multimodal.sampleFrames(
        Multimodal.binarySource(spark, d.toString, "*.bin"),
        stride = 3, maxFrames = 100)
      .collect().groupBy(_.path.split("/").last)
    // 10 frames, every 3rd: indices 0,3,6,9
    assert(frames("clip.bin").map(_.frameIdx).sorted.toSeq === Seq(0, 3, 6, 9))
    assert(frames("tiny.bin").map(_.frameIdx).toSeq === Seq(0))
    // identical bytes → identical frame fingerprints
    assert(frames("clip.bin").map(_.frameMd5).distinct.length === 1)
  }

  test("y4mFrames really demuxes Y4M: geometry per colourspace, truncation, malformed input (U1 video)") {
    def y4m(colour: String, w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C$colour\n".getBytes("ASCII"))
      frames.foreach { f => bos.write("FRAME\n".getBytes("ASCII")); bos.write(f) }
      bos.toByteArray
    }
    // mono: frame = W·H luma bytes exactly
    val mono = y4m("mono", 4, 3, Seq(Array.fill(12)(10.toByte), Array.fill(12)(200.toByte)))
    val mf = Multimodal.y4mFrames(mono)
    assert(mf.map(f => (f.idx, f.width, f.height, f.frameSize)) ===
      Seq((0, 4, 3, 12), (1, 4, 3, 12)))
    // 420: frame = 3/2·W·H; the luma plane is still the first W·H bytes
    val c420 = y4m("420jpeg", 4, 2, Seq(Array.fill(12)(99.toByte)))
    assert(Multimodal.y4mFrames(c420).map(f => (f.frameSize, f.ySize)) === Seq((12, 8)))
    // a truncated trailing frame is dropped, complete frames survive
    val truncated = mono.dropRight(5)
    assert(Multimodal.y4mFrames(truncated).map(_.idx) === Seq(0))
    // malformed input → Nil, never a throw
    assert(Multimodal.y4mFrames("not a video".getBytes) === Nil)
    assert(Multimodal.y4mFrames(Array.empty[Byte]) === Nil)
    // crafted overflow header (w·h·3 > Int.MaxValue) → Nil, never an
    // infinite frame walk
    assert(Multimodal.y4mFrames(
      ("YUV4MPEG2 W2 H2147483647 C444\nFRAME\n" + "x" * 64).getBytes) === Nil)
  }

  test("demuxY4m and sampleFrames decode REAL Y4M frame bytes (U1 video)") {
    val d = Files.createTempDirectory("y4m")
    // 3 mono frames 4x3, constant lumas 30/60/90
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W4 H3 F25:1 Ip A1:1 Cmono\n".getBytes("ASCII"))
    Seq(30, 60, 90).foreach { g =>
      bos.write("FRAME\n".getBytes("ASCII"))
      bos.write(Array.fill(12)(g.toByte))
    }
    Files.write(d.resolve("clip.y4m"), bos.toByteArray)
    val src = Multimodal.binarySource(spark, d.toString, "*.y4m")
    // stride 2 → container frame indices 0 and 2, true dims, true mean luma
    val vf = Multimodal.demuxY4m(src, stride = 2, maxFrames = 10)
      .collect().sortBy(_.frame_idx)
    assert(vf.map(f => (f.frame_idx, f.width, f.height)).toSeq ===
      Seq((0, 4, 3), (2, 4, 3)))
    assert(vf.map(_.mean_luma).toSeq ===
      Seq(30, 90).map(g => BigDecimal(g / 255.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // sampleFrames takes the Y4M path: frameMd5 covers the REAL payload
    val fr = Multimodal.sampleFrames(src, stride = 2, maxFrames = 10)
      .collect().sortBy(_.frameIdx)
    def md5hex(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map(x => f"$x%02x").mkString
    assert(fr.map(_.frameIdx).toSeq === Seq(0, 2))
    assert(fr.map(_.frameMd5).toSeq ===
      Seq(30, 90).map(g => md5hex(Array.fill(12)(g.toByte))))
    // the engine fixture generator builds byte-identical containers: the
    // y4mVideo column round-trips through the same real demuxer
    val fixture = Seq(1L).toDF("id").select(col("id").cast("string").as("path"),
      Multimodal.y4mVideo(lit(4), lit(3), array(lit(30), lit(60), lit(90))).as("content"))
    assert(fixture.select(col("content")).as[Array[Byte]].head().toSeq ===
      bos.toByteArray.toSeq)
  }

  test("y4mFrames round-trips randomized containers across colourspaces") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 50) {
      val w = 1 + rnd.nextInt(12); val h = 1 + rnd.nextInt(9)
      val (colour, mult) = Seq(("mono", 2), ("420jpeg", 3), ("422", 4), ("444", 6))(rnd.nextInt(4))
      val frameSize = w * h * mult / 2
      val n = rnd.nextInt(5)
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(s"YUV4MPEG2 W$w H$h F30000:1001 Ip A1:1 C$colour\n".getBytes("ASCII"))
      val frames = (0 until n).map { _ =>
        val f = Array.fill(frameSize)(rnd.nextInt(256).toByte)
        bos.write("FRAME\n".getBytes("ASCII")); bos.write(f); f
      }
      val got = Multimodal.y4mFrames(bos.toByteArray)
      assert(got.length === n, s"W$w H$h C$colour n=$n")
      got.zip(frames).foreach { case (g, f) =>
        assert((g.width, g.height, g.frameSize, g.ySize) === (w, h, frameSize, w * h))
        assert(bos.toByteArray.slice(g.start, g.start + g.frameSize).toSeq === f.toSeq)
      }
    }
  }

  test("wavPcm16 fixture round-trips through parseWavPcm16 with exact sample stats (U1 audio)") {
    val samples = Seq(0, 1, -1, 32767, -32768, 12345, -12345)
    val df = Seq(("clip", samples)).toDF("path", "s")
      .select(col("path"),
        Multimodal.wavPcm16(lit(8000), lit(1), col("s")).as("content"))
    val clip = Multimodal.decodeWavSamples(df).collect().head
    assert(clip.sample_rate === 8000 && clip.channels === 1)
    assert(clip.n_samples === samples.length)
    val amps = samples.map(_ / 32768.0)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(clip.mean_amp === r6(amps.sum / amps.length))
    assert(clip.rms === r6(math.sqrt(amps.map(a => a * a).sum / amps.length)))
    // the parser is a real chunk walker, not a 44-byte-offset reader: an
    // extra LIST chunk between fmt and data must not break it
    val canonical = df.select(col("content")).as[Array[Byte]].collect().head
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(canonical, 0, 36)                    // RIFF..fmt chunk
    bos.write("LIST".getBytes("ASCII")); bos.write(Array[Byte](4, 0, 0, 0))
    bos.write("INFO".getBytes("ASCII"))            // 4-byte LIST body
    bos.write(canonical, 36, canonical.length - 36) // data chunk
    val shifted = Multimodal.parseWavPcm16("clip", bos.toByteArray)
    assert(shifted.contains(clip.copy()))
    // malformed input: truncated payload, wrong magic, non-PCM16 → None
    assert(Multimodal.parseWavPcm16("t", canonical.dropRight(3)).isEmpty)
    assert(Multimodal.parseWavPcm16("t", "JUNK".getBytes("ASCII")).isEmpty)
    val nonPcm = canonical.clone(); nonPcm(20) = 3  // audioFormat = float
    assert(Multimodal.parseWavPcm16("t", nonPcm).isEmpty)
  }

  test("blobSink writes payloads from executors (S8)") {
    val out = Files.createTempDirectory("mmout").toString
    val df = Seq(("x.bin", Array[Byte](1, 2, 3)), ("y.bin", Array[Byte](9)))
      .toDF("name", "content")
    Multimodal.blobSink(df, "name", "content", out)
    assert(Files.readAllBytes(Paths.get(out, "x.bin")).toSeq === Seq[Byte](1, 2, 3))
    assert(Files.readAllBytes(Paths.get(out, "y.bin")).toSeq === Seq[Byte](9))
  }
}
