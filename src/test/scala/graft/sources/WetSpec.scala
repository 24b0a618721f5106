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
  }
}
