package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The WET (WARC conversion) source: wire-format round-trip, record
  * boundaries under adversarial payloads, gzip member handling, and
  * interop with the real Common Crawl record shape (headers this writer
  * never emits must parse fine).
  */
class WetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("round-trip: url/date/text survive; payload containing 'WARC/1.0' lines cannot split a record") {
    val adversarial = "first line\r\nWARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 9999\r\n\r\nnot a record — just text that looks like one"
    val rows = Seq(
      ("https://a.example/1", "2024-03-01 00:00:10", "plain text body"),
      ("https://a.example/2", "2024-03-01 00:00:20", adversarial),
      ("https://b.example/3", "2024-03-01 00:00:30", "über die Brücke 好的文字"),
      ("https://b.example/4", "2024-03-01 00:00:40", ""))
      .toDF("url", "ts", "text")
      .withColumn("ts", col("ts").cast("timestamp"))
    val dir = tmp("wet_rt")
    Wet.writeWetShards(rows, "url", "ts", "text", dir, numShards = 2)
    val back = Wet.readWet(spark, dir)
      .select("url", "record_ts", "text")
      .as[(String, java.sql.Timestamp, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(back.keySet === Set("https://a.example/1", "https://a.example/2",
      "https://b.example/3", "https://b.example/4"))
    assert(back("https://a.example/2")._2 === adversarial)
    assert(back("https://b.example/3")._2 === "über die Brücke 好的文字")
    assert(back("https://b.example/4")._2 === "")
    assert(back("https://a.example/1")._1 ===
      java.sql.Timestamp.valueOf("2024-03-01 00:00:10"))
    // determinism: a second write produces byte-identical shards
    val dir2 = tmp("wet_rt2")
    Wet.writeWetShards(rows, "url", "ts", "text", dir2, numShards = 2)
    def shardBytes(d: String): Map[String, Seq[Byte]] =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".wet"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    assert(shardBytes(dir) === shardBytes(dir2))
  }

  test("real Common Crawl record shape parses: extra headers, warcinfo skip, inter-record slack") {
    // the header set an actual crawl emits (incl. fields our writer never
    // produces) — the parser must treat unknown headers as inert
    val payload = "Extracted page text.\nSecond line.".getBytes("UTF-8")
    val rec =
      ("WARC/1.0\r\n" +
        "WARC-Type: conversion\r\n" +
        "WARC-Target-URI: http://example.com/page\r\n" +
        "WARC-Date: 2019-08-17T04:12:32Z\r\n" +
        "WARC-Record-ID: <urn:uuid:5a5e6f92-3cf8-45a1-9b0c-1c3b2e6a0001>\r\n" +
        "WARC-Refers-To: <urn:uuid:5a5e6f92-3cf8-45a1-9b0c-1c3b2e6a0002>\r\n" +
        "WARC-Block-Digest: sha1:2DUOKX5JUQVVYXTJHLRZ5SH6MKECFZ7M\r\n" +
        "WARC-Identified-Content-Language: eng\r\n" +
        "Content-Type: text/plain\r\n" +
        s"Content-Length: ${payload.length}\r\n" +
        "\r\n").getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
    val info = Wet.warcinfoRecord("CC-MAIN-x.warc.wet", "2019-08-17T04:00:00Z")
    // extra blank line of slack between records (seen in the wild)
    val bytes = info ++ "\r\n".getBytes("UTF-8") ++ rec
    val parsed = Wet.parseWetBytes("t.wet", bytes)
    assert(parsed === Seq(("http://example.com/page",
      "2019-08-17T04:12:32Z", "Extracted page text.\nSecond line.")))
  }

  test("recrawled URLs get DISTINCT WARC-Record-IDs (uniqueness is a WARC requirement)") {
    // r16 ADVICE: record ids derived from the URI alone repeat when the
    // same URL is serialized twice (recrawl fixtures — the url#file:ix
    // doc-id scheme exists to ingest them). Date and per-file ordinal
    // now fold in; same (uri, date, ordinal) stays deterministic.
    def recIdOf(rec: Array[Byte]): String =
      new String(rec, "UTF-8").linesIterator
        .find(_.startsWith("WARC-Record-ID:")).get
    val u = "https://re.example/crawled"
    // same URL, different dates (two crawls)
    val c1 = recIdOf(Wet.conversionRecord(u, "2024-01-01T00:00:00Z",
      "day one".getBytes("UTF-8"), 0L))
    val c2 = recIdOf(Wet.conversionRecord(u, "2024-01-02T00:00:00Z",
      "day two".getBytes("UTF-8"), 1L))
    assert(c1 !== c2)
    val r1 = recIdOf(Wet.responseRecord(u, "2024-01-01T00:00:00Z",
      "text/html", "<p>one</p>".getBytes("UTF-8"), 0L))
    val r2 = recIdOf(Wet.responseRecord(u, "2024-01-02T00:00:00Z",
      "text/html", "<p>two</p>".getBytes("UTF-8"), 1L))
    assert(r1 !== r2)
    // same URL, same date, different ordinal (two records in one file)
    val s1 = recIdOf(Wet.responseRecord(u, "2024-01-01T00:00:00Z",
      "text/html", "<p>a</p>".getBytes("UTF-8"), 0L))
    val s2 = recIdOf(Wet.responseRecord(u, "2024-01-01T00:00:00Z",
      "text/html", "<p>a</p>".getBytes("UTF-8"), 1L))
    assert(s1 !== s2)
    // determinism holds: identical inputs → identical id
    assert(s1 === recIdOf(Wet.responseRecord(u, "2024-01-01T00:00:00Z",
      "text/html", "<p>a</p>".getBytes("UTF-8"), 0L)))
    // end-to-end: a recrawl fixture written through the shard writer
    // serializes unique record ids across the whole output
    val dir = tmp("warc_recrawl")
    val rows = Seq(
      (u, "2024-01-01 00:00:00", "<html><body>day one</body></html>"),
      (u, "2024-01-02 00:00:00", "<html><body>day two</body></html>"),
      ("https://other.example/x", "2024-01-01 00:00:00",
        "<html><body>other</body></html>"))
      .toDF("url", "ts", "html")
      .select(col("url"), col("ts").cast("timestamp").as("ts"), col("html"))
    Wet.writeWarcShards(rows, "url", "ts", "html", None, dir, 1)
    val ids = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filter(_.endsWith(".warc"))
      .flatMap { f =>
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(f)), "ISO-8859-1")
          .linesIterator.filter(_.startsWith("WARC-Record-ID:")).toSeq
      }
    assert(ids.length === 4) // warcinfo + 3 responses
    assert(ids.distinct.length === 4)
  }

  test("gzip: multi-member streams (one member per record — the crawl layout) decompress whole") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val r1 = Wet.conversionRecord("https://x/1", "2024-01-01T00:00:00Z",
      "first".getBytes("UTF-8"))
    val r2 = Wet.conversionRecord("https://x/2", "2024-01-01T00:00:01Z",
      "second".getBytes("UTF-8"))
    val multi = gz(r1) ++ gz(r2) // member-per-record concatenation
    val plain = Wet.gunzipAll(multi)
    assert(plain.toSeq === (r1 ++ r2).toSeq)
    // end-to-end through the reader: write a .gz file and read the dir
    val dir = tmp("wet_gz")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part.warc.wet.gz"), multi)
    val urls = Wet.readWet(spark, dir).select("url")
      .as[String].collect().toSet
    assert(urls === Set("https://x/1", "https://x/2"))
  }

  test("WARC response round-trip: header-declared and meta-declared charsets both sniff; envelope fields survive") {
    val rows = Seq(
      ("https://w.example/1", "2024-03-01 00:00:10",
        "<html><head><meta charset=\"utf-8\"/></head><body>héllo ünïcode</body></html>",
        "utf-8"),
      ("https://w.example/2", "2024-03-01 00:00:20",
        "<html><head><meta charset=\"utf-8\"/></head><body>meta-only page</body></html>",
        null.asInstanceOf[String]))
      .toDF("url", "ts", "html", "cs")
      .withColumn("ts", col("ts").cast("timestamp"))
    val dir = tmp("warc_rt")
    Wet.writeWarcShards(rows, "url", "ts", "html", Some("cs"), dir, 2)
    val back = Wet.readWarc(spark, dir)
      .select("url", "http_status", "content_type", "charset", "html")
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), r.getString(3), r.getString(4)))).toMap
    assert(back.keySet === Set("https://w.example/1", "https://w.example/2"))
    val (st1, ct1, cs1, h1) = back("https://w.example/1")
    assert(st1 === 200 && ct1 === "text/html; charset=utf-8" && cs1 === "UTF-8")
    assert(h1.contains("héllo ünïcode"))
    val (_, ct2, cs2, _) = back("https://w.example/2")
    assert(ct2 === "text/html" && cs2 === "UTF-8") // sniffed from <meta>
    // determinism: byte-identical shards on rewrite
    val dir2 = tmp("warc_rt2")
    Wet.writeWarcShards(rows, "url", "ts", "html", Some("cs"), dir2, 2)
    def shardBytes(d: String): Map[String, Seq[Byte]] =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".warc"))
        .map(f => f.getName ->
          java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    assert(shardBytes(dir) === shardBytes(dir2))
  }

  test("WARC response: NON-UTF-8 pages decode correctly (header ISO-8859-1, meta windows-1252, BOM beats both)") {
    // a Latin-1 page: 'é' is the single byte 0xE9 — as UTF-8 it would be
    // malformed and become U+FFFD soup (the r15 gap this sniffer closes)
    val latin1Body = "<html><body>café crème</body></html>"
      .getBytes("ISO-8859-1")
    val r1 = Wet.responseRecord("http://l1.example/", "2019-08-17T04:12:32Z",
      "text/html; charset=ISO-8859-1", latin1Body)
    // meta-declared windows-1252 with a 0x97 em-dash (undefined in
    // ISO-8859-1 proper, so the label matters)
    val cp1252Body = ("<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=windows-1252\"></head>" +
      "<body>dash — here</body></html>").getBytes("windows-1252")
    val r2 = Wet.responseRecord("http://w2.example/", "2019-08-17T04:12:33Z",
      "text/html", cp1252Body)
    // UTF-8 BOM wins over a LYING header that claims ISO-8859-1
    val bomBody = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "<html><body>真のUTF-8</body></html>".getBytes("UTF-8")
    val r3 = Wet.responseRecord("http://b3.example/", "2019-08-17T04:12:34Z",
      "text/html; charset=ISO-8859-1", bomBody)
    val parsed = Wet.parseWarcResponseBytes("t.warc",
      Wet.warcinfoRecord("t.warc", "2019-08-17T04:00:00Z") ++ r1 ++ r2 ++ r3)
    assert(parsed.length === 3)
    val byUrl = parsed.map(p => p._1 -> p).toMap
    assert(byUrl("http://l1.example/")._5 === "ISO-8859-1")
    assert(byUrl("http://l1.example/")._6.contains("café crème"))
    assert(byUrl("http://w2.example/")._5 === "windows-1252")
    assert(byUrl("http://w2.example/")._6.contains("dash — here"))
    assert(byUrl("http://b3.example/")._5 === "UTF-8")
    assert(byUrl("http://b3.example/")._6.contains("真のUTF-8"))
    // the BOM itself is STRIPPED, not decoded into a stray U+FEFF first
    // char (the JDK's fixed-endian decoders keep it; fingerprints and
    // token stats would silently diverge from the BOM-less twin)
    assert(!byUrl("http://b3.example/")._6.contains("\ufeff"))
    assert(byUrl("http://b3.example/")._6.startsWith("<html>"))
    // UTF-16LE BOM: sniffed, stripped, decoded
    val u16Body = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      "<html><body>utf sixteen page</body></html>".getBytes("UTF-16LE")
    val r4 = Wet.responseRecord("http://u16.example/",
      "2019-08-17T04:12:36Z", "text/html", u16Body)
    val p4 = Wet.parseWarcResponseBytes("u16.warc", r4)
    assert(p4.head._5 === "UTF-16LE")
    assert(p4.head._6 === "<html><body>utf sixteen page</body></html>")
    // an unknown charset label falls through to the meta/default chain,
    // never throws; malformed bytes surface as U+FFFD, never an abort
    val junk = Wet.responseRecord("http://j.example/", "2019-08-17T04:12:35Z",
      "text/html; charset=klingon-8", Array[Byte](0x41, 0xe9.toByte, 0x42))
    val pj = Wet.parseWarcResponseBytes("j.warc", junk)
    assert(pj.head._5 === "UTF-8")
    assert(pj.head._6 === "A�B")
  }

  test("WARC response: chunked transfer-encoding and gzip content-encoding unwrap; real-shape record parses") {
    // chunked body: 2 chunks + terminal
    val chunked = ("5\r\nhello\r\n7\r\n, world\r\n0\r\n\r\n").getBytes("ISO-8859-1")
    assert(new String(Wet.dechunk(chunked), "UTF-8") === "hello, world")
    val http = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked\r\n" +
      "\r\n").getBytes("ISO-8859-1") ++ chunked
    val (st, hdrs, body) = Wet.parseHttpResponse(http)
    assert(st === 200 && hdrs("content-type") === "text/plain")
    assert(new String(body, "UTF-8") === "hello, world")
    // gzip content-encoding
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write("compressed page body".getBytes("UTF-8")); g.close()
    val http2 = ("HTTP/1.1 200 OK\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes("ISO-8859-1") ++ bo.toByteArray
    val (_, _, body2) = Wet.parseHttpResponse(http2)
    assert(new String(body2, "UTF-8") === "compressed page body")
    // real crawl record shape: extra WARC headers are inert; request
    // records are skipped by type; fractional WARC 1.1 dates parse in
    // readWarc (try_to_timestamp fallback arm)
    val payload = ("HTTP/1.1 301 Moved Permanently\r\n" +
      "Location: http://example.com/new\r\n" +
      "Content-Type: text/html; charset=UTF-8\r\n\r\n" +
      "<html><body>moved</body></html>").getBytes("ISO-8859-1")
    val rec = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.com/old\r\n" +
      "WARC-Date: 2019-08-17T04:12:32.123Z\r\n" +
      "WARC-Record-ID: <urn:uuid:5a5e6f92-3cf8-45a1-9b0c-1c3b2e6a0003>\r\n" +
      "WARC-Payload-Digest: sha1:XXXXYYYY\r\n" +
      "WARC-IP-Address: 93.184.216.34\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n").getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
    val req = ("WARC/1.0\r\n" +
      "WARC-Type: request\r\n" +
      "WARC-Target-URI: http://example.com/old\r\n" +
      "Content-Length: 0\r\n" +
      "\r\n\r\n\r\n").getBytes("UTF-8")
    val dir = tmp("warc_real")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "crawl.warc"), req ++ rec)
    val rows = Wet.readWarc(spark, dir)
      .select("url", "record_ts", "http_status", "html")
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "http://example.com/old")
    assert(rows.head.getInt(2) === 301)
    assert(!rows.head.isNullAt(1), "fractional WARC 1.1 date must parse")
    assert(rows.head.getString(3).contains("moved"))
  }

  test("WARC binary responses: raw bytes survive untouched — no charset decode corrupts a blob payload") {
    // 0x89 (PNG magic byte 0) is malformed as UTF-8 lead byte: a text
    // decode would turn it to U+FFFD and the image would be garbage
    val pngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a)
    val body = pngMagic ++ Array.tabulate(64)(i => (i * 7 % 251).toByte)
    val rows = Seq(("https://img.example/x", "2024-01-01 00:00:01"))
      .toDF("url", "ts").withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("body", lit(body)).withColumn("ct", lit("image/png"))
    val dir = tmp("warc_bin")
    Wet.writeWarcBinaryShards(rows, "url", "ts", "body", "ct", dir, 1)
    val got = Wet.readWarcBinary(spark, dir)
      .select("url", "content_type", "content").collect()
    assert(got.length === 1)
    assert(got.head.getString(1) === "image/png")
    assert(got.head.getAs[Array[Byte]](2).toSeq === body.toSeq)
    // the multimodal magic sniff composes directly on the ingested bytes
    val sniffed = Wet.readWarcBinary(spark, dir)
      .select(graft.multimodal.Multimodal.magicFormat(col("content"))
        .as("fmt")).as[String].collect()
    assert(sniffed.toSeq === Seq("png"))
  }

  test("WET/WARC dates: malformed WARC-Date yields a NULL ts under ANSI, never an ingest abort") {
    // r15 ADVICE: to_timestamp under Spark 4 ANSI throws on pattern
    // mismatch, contradicting the docstring's null-ts promise
    val rec = Wet.conversionRecord("https://bad-date.example/",
      "not-a-date-at-all", "body text".getBytes("UTF-8"))
    val dir = tmp("wet_baddate")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "bad.warc.wet"), rec)
    val rows = Wet.readWet(spark, dir)
      .select("url", "record_ts", "record_ix").collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(1), "malformed date must be null, not throw")
    assert(rows.head.getInt(2) === 0)
  }

  test("WARC dates parse as UTC instants regardless of the session timezone") {
    // readWet/readWarc are public API; a pattern arm with a LITERAL 'Z'
    // would parse the wall clock in the SESSION zone (the read-side twin
    // of the r15 writer bug) — the bare ISO-8601 parse honors the offset
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val rec = Wet.conversionRecord("https://tz.example/",
        "2024-01-01T12:00:00Z", "body".getBytes("UTF-8"))
      val dir = tmp("wet_tz")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "tz.warc.wet"), rec)
      val ts = Wet.readWet(spark, dir).select("record_ts")
        .head().getTimestamp(0)
      assert(ts.toInstant === java.time.Instant.parse("2024-01-01T12:00:00Z"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("malformed HTTP status lines degrade to 0, never abort the ingest") {
    // double space → empty token; oversized digit run → would overflow
    val httpDouble = ("HTTP/1.1  200 OK\r\n\r\nbody").getBytes("ISO-8859-1")
    assert(Wet.parseHttpResponse(httpDouble)._1 === 0)
    val httpHuge = ("HTTP/1.1 99999999999 OK\r\n\r\nbody").getBytes("ISO-8859-1")
    assert(Wet.parseHttpResponse(httpHuge)._1 === 0)
    val httpOk = ("HTTP/1.1 404 Not Found\r\n\r\nbody").getBytes("ISO-8859-1")
    assert(Wet.parseHttpResponse(httpOk)._1 === 404)
  }

  test("malformed records fail loudly with file context, never desynchronize silently") {
    val noLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n").getBytes("UTF-8")
    val e = intercept[IllegalArgumentException] {
      Wet.parseWetBytes("bad.wet", noLen)
    }
    assert(e.getMessage.contains("Content-Length"), e.getMessage)
    val truncated = Wet.conversionRecord("https://x/1",
      "2024-01-01T00:00:00Z", "full body".getBytes("UTF-8")).dropRight(8)
    val e2 = intercept[IllegalArgumentException] {
      Wet.parseWetBytes("trunc.wet", truncated)
    }
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
    // hostile lengths and unterminated headers fail as PARSE errors with
    // file context, never as bare allocation faults (r17 hardening)
    val negLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: -5\r\n\r\n").getBytes("UTF-8")
    val e3 = intercept[IllegalArgumentException] {
      Wet.parseWetBytes("neg.wet", negLen)
    }
    assert(e3.getMessage.contains("negative Content-Length"), e3.getMessage)
    val runaway = ("WARC/1.0\r\n" + "x" * (1 << 21)).getBytes("UTF-8")
    val e4 = intercept[IllegalArgumentException] {
      Wet.parseWetBytes("runaway.wet", runaway)
    }
    assert(e4.getMessage.contains("1 MiB"), e4.getMessage)
  }
}
