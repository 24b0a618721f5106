package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET (WARC conversion) SOURCE — the Common Crawl interchange format web
  * curation actually starts from. A WET file is a sequence of WARC/1.0
  * records: a leading `warcinfo` record, then one `conversion` record per
  * page holding the extracted plain text, each with a CRLF header block
  * (`WARC-Target-URI`, `WARC-Date`, `Content-Length`, …) and a payload of
  * exactly `Content-Length` bytes. The CCNet/RefinedWeb pipeline family
  * this engine's curation surface mirrors ingests these files as stage 0;
  * without this reader a user must pre-convert crawls to parquet with
  * another tool.
  *
  * RECORD-BOUNDARY CORRECTNESS: the payload is sliced by `Content-Length`
  * — never by scanning for the next `WARC/1.0` marker — so a page whose
  * TEXT contains a line `WARC/1.0` cannot split a record (asserted in
  * WetSpec). Between records any number of CRLF separators is accepted
  * (the spec says exactly two; real files vary).
  *
  * Scale shape: one task per WET file via the binaryFile source — the
  * same split discipline as [[graft.multimodal.TarShards.readTarShards]]
  * (a crawl ships ~64k files of ~150 MB; file count IS the read
  * parallelism, and gzip members don't split anyway). `.gz` inputs are
  * decompressed in-task; Common Crawl's member-per-record gzip
  * concatenation is handled by the JDK stream (multi-member aware).
  *
  * The writer exists for DETERMINISTIC FIXTURE SYNTHESIS and shard export
  * (the s16 tar discipline): same rows → byte-identical shards (record
  * ids are md5-derived from the URI, never random UUIDs), one sequential
  * file per shard, records URI-sorted within it.
  *
  * Encoding note: payloads decode as UTF-8 with malformed bytes replaced
  * by U+FFFD (the JVM String contract) — so text entering the engine
  * from raw crawl bytes is ALWAYS valid UTF-8, upholding the contract
  * the native text kernels state
  * ([[graft.functions.TrigramBucketsKernel]]'s valid-UTF-8 input rule).
  */
object Wet {

  private val Crlf = "\r\n"

  /** One serialized `conversion` record (header block + payload + the
    * two-CRLF separator). `date` must already be ISO-8601 Zulu — the
    * WARC-Date wire format.
    */
  private[sources] def conversionRecord(uri: String, date: String,
                                        payload: Array[Byte]): Array[Byte] = {
    val recId = java.util.UUID.nameUUIDFromBytes(
      uri.getBytes("UTF-8")).toString
    val header =
      s"WARC/1.0${Crlf}" +
        s"WARC-Type: conversion${Crlf}" +
        s"WARC-Target-URI: $uri${Crlf}" +
        s"WARC-Date: $date${Crlf}" +
        s"WARC-Record-ID: <urn:uuid:$recId>${Crlf}" +
        s"Content-Type: text/plain${Crlf}" +
        s"Content-Length: ${payload.length}${Crlf}" +
        Crlf
    val h = header.getBytes("UTF-8")
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** The file-leading `warcinfo` record real WET files carry — the reader
    * must skip it by type, so the fixture writer emits it too.
    */
  private[sources] def warcinfoRecord(filename: String,
                                      date: String): Array[Byte] = {
    val body = (s"software: graft-wet-writer${Crlf}" +
      s"format: WARC File Format 1.0${Crlf}").getBytes("UTF-8")
    val recId = java.util.UUID.nameUUIDFromBytes(
      ("warcinfo|" + filename).getBytes("UTF-8")).toString
    val header =
      s"WARC/1.0${Crlf}" +
        s"WARC-Type: warcinfo${Crlf}" +
        s"WARC-Date: $date${Crlf}" +
        s"WARC-Filename: $filename${Crlf}" +
        s"WARC-Record-ID: <urn:uuid:$recId>${Crlf}" +
        s"Content-Type: application/warc-fields${Crlf}" +
        s"Content-Length: ${body.length}${Crlf}" +
        Crlf
    val h = header.getBytes("UTF-8")
    val out = new Array[Byte](h.length + body.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Write (url, ts, text) rows as `numShards` WET files under `dir`
    * (`shard-00000.warc.wet`, …). Deterministic by construction: shard
    * membership is `xxhash64(url) mod numShards`, records are URI-sorted
    * inside each file, record ids derive from the URI, and WARC-Date is
    * the row's `tsCol` formatted ISO-8601 Zulu. The writeTarShards
    * partition discipline: whole shards per partition, one sequential
    * write each, no driver-side anything.
    */
  /** ISO-8601 Zulu rendering of an instant — ALWAYS UTC, independent of
    * the Spark session timezone. The old `date_format(..., ...'Z')` form
    * rendered the SESSION-zone wall clock with a literal Z appended, so a
    * non-UTC session labeled local time as UTC on the wire (r15 ADVICE);
    * formatting executor-side from the raw instant removes the session
    * from the equation entirely (and has no DST edge cases).
    */
  private val ZuluFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  def writeWetShards(df: DataFrame, urlCol: String, tsCol: String,
                     textCol: String, dir: String, numShards: Int): Unit = {
    require(numShards >= 1, s"numShards $numShards < 1")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(urlCol).cast("string").as("__u"),
        col(tsCol).cast("timestamp").as("__d"),
        col(textCol).cast("string").as("__t"))
      .withColumn("__shard", pmod(xxhash64(col("__u")), lit(numShards.toLong)))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions("__shard", "__u")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(conf.value)
        var cur = -1L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        rows.foreach { r =>
          val shard = r.getLong(3)
          if (shard != cur) {
            close(); cur = shard
            val name = f"shard-$shard%05d.warc.wet"
            out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
            out.write(warcinfoRecord(name, "2024-01-01T00:00:00Z"))
          }
          require(r.getString(0) != null && !r.isNullAt(1) &&
            r.getString(2) != null,
            "writeWetShards: null url, ts, or text — WARC-Date is " +
              "mandatory on the wire; rows that came back from readWet " +
              "with an unparseable date carry a null record_ts, so " +
              "filter them (p7 null-drop) or fill a date before " +
              "re-sharding")
          out.write(conversionRecord(r.getString(0),
            ZuluFmt.format(r.getTimestamp(1).toInstant),
            r.getString(2).getBytes("UTF-8")))
        }
        close()
      }
  }

  /** Walk one in-memory WARC byte stream: every record's (lowercased
    * header field map, payload byte slice), any WARC-Type. The shared
    * record walk under [[parseWetBytes]] (WET `conversion`) and the
    * response collectors. Payloads are sliced by Content-Length ONLY;
    * malformed records (no blank line, missing Content-Length) fail
    * loudly with the file context rather than desynchronizing the walk.
    * `wanted` gates the payload COPY: raw crawls interleave
    * request/metadata records with responses, and materializing a byte
    * copy the collector immediately discards would double the ingest's
    * allocation — an unwanted record costs only its header parse.
    */
  private[sources] def walkWarcRecords(path: String, bytes: Array[Byte],
                                       wanted: Map[String, String] => Boolean =
                                         _ => true)
      : Seq[(Map[String, String], Array[Byte])] = {
    val out = Seq.newBuilder[(Map[String, String], Array[Byte])]
    var off = 0
    val n = bytes.length
    def isCrlfAt(i: Int): Boolean =
      i + 1 < n && bytes(i) == '\r' && bytes(i + 1) == '\n'
    while (off < n) {
      // tolerate any number of inter-record CRLFs (spec says two)
      while (off < n && (isCrlfAt(off) || bytes(off) == '\n'))
        off += (if (isCrlfAt(off)) 2 else 1)
      if (off < n) {
        // header block: lines to the first empty line
        var hEnd = off
        while (hEnd < n && !(isCrlfAt(hEnd) &&
            hEnd + 3 < n && bytes(hEnd + 2) == '\r' && bytes(hEnd + 3) == '\n'))
          hEnd += 1
        require(hEnd < n,
          s"readWarc: unterminated header block at offset $off in $path")
        val header = new String(bytes, off, hEnd + 2 - off, "UTF-8")
        val lines = header.split("\r\n")
        require(lines.headOption.exists(_.startsWith("WARC/")),
          s"readWarc: record at offset $off in $path does not start with " +
            s"a WARC version line (got '${lines.headOption.getOrElse("")}')")
        val fields = lines.drop(1).flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None
          else Some(l.substring(0, i).trim.toLowerCase ->
            l.substring(i + 1).trim)
        }.toMap
        val len = fields.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"readWarc: record at offset $off in $path has no " +
              "Content-Length — cannot find the record boundary")).toLong
        val pStart = hEnd + 4
        require(pStart + len <= n,
          s"readWarc: truncated payload at offset $off in $path")
        if (wanted(fields))
          out += ((fields, java.util.Arrays.copyOfRange(bytes, pStart,
            pStart + len.toInt)))
        off = pStart + len.toInt
      }
    }
    out.result()
  }

  /** Parse one in-memory WET byte stream into (uri, dateStr, text) for
    * every `conversion` record — the per-file task body of [[readWet]],
    * split out for direct testing.
    */
  private[sources] def parseWetBytes(path: String, bytes: Array[Byte])
      : Seq[(String, String, String)] =
    walkWarcRecords(path, bytes, isType("conversion")).map {
      case (fields, payload) =>
        (fields.getOrElse("warc-target-uri", ""),
          fields.getOrElse("warc-date", ""),
          new String(payload, "UTF-8"))
    }

  /** One WARC-Type predicate definition per collector — the walker
    * pre-filters on it (so unwanted payloads are never byte-copied) and
    * the collector trusts that filter; duplicating the predicate in a
    * collect guard invited the two copies drifting apart.
    */
  private def isType(t: String): Map[String, String] => Boolean =
    _.get("warc-type").exists(_.equalsIgnoreCase(t))

  /** Gunzip a whole stream, multi-member aware (Common Crawl gzips each
    * record as its own member; the JDK stream reads across members).
    */
  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](65536)
    var r = in.read(buf)
    while (r >= 0) { out.write(buf, 0, r); r = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** WARC-Date → timestamp, ANSI-safe AND session-timezone-safe:
    * `try_to_timestamp` with NO pattern — the bare ISO-8601 parse
    * honors the `Z` as a UTC offset and accepts WARC 1.1 fractional
    * seconds; a malformed date is null, never a throw (under Spark 4's
    * default ANSI mode `to_timestamp` THROWS on pattern mismatch and
    * kills the whole ingest — r15 ADVICE). A pattern arm with a
    * LITERAL 'Z' ("yyyy-MM-dd'T'HH:mm:ss'Z'") would re-introduce on
    * the read side the session-tz bug [[ZuluFmt]] fixes on the write
    * side: the wall clock would parse in the session zone with the Z
    * ignored — readWet/readWarc are public API and only this repo's
    * own entry points pin UTC sessions.
    */
  private def parseWarcDate(c: Column): Column = try_to_timestamp(c)

  /** Read WET files under `dir` as `(wet_file, record_ix, url,
    * record_ts, text)` — one row per `conversion` record, `record_ix`
    * its 0-based position among the file's conversion records (with
    * `wet_file` a stable provenance key, and the uniquifier CLI ingest
    * composes into doc ids — real crawls repeat WARC-Target-URI across
    * recrawls); `warcinfo`/`request`/`response` records are skipped by
    * type. `.gz` files are decompressed in-task. `record_ts` is the
    * parsed WARC-Date; rows with an unparseable date carry a null ts
    * rather than dropping (the p7 null-drop operator is the caller's
    * explicit choice) — [[parseWarcDate]] keeps that promise under ANSI.
    */
  def readWet(spark: SparkSession, dir: String,
              glob: String = "*.wet*"): DataFrame =
    wetRowsOf(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir))

  /** STREAMING twin of [[readWet]]: watch `dir` as a file stream — each
    * newly-landed WET shard becomes rows of the micro-batch that saw it,
    * through the SAME per-file record walk (a stateless flatMap is
    * stream-safe; no state store, no batch/stream fork). Compose with
    * [[graft.streaming.Streaming.ingestCandidates]] for continuous
    * crawl-drop dedup against the persisted band index — candidates
    * surface within the micro-batch that landed the shard.
    */
  def readWetStream(spark: SparkSession, dir: String,
                    glob: String = "*.wet*"): DataFrame =
    wetRowsOf(spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", glob).load(dir))

  /** The fixed schema of the binaryFile source (streaming reads must
    * declare it up front; the batch source infers the identical one).
    */
  private val BinaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  /** (path, content) → WET rows — the transform shared by [[readWet]]
    * and [[readWetStream]]. */
  private def wetRowsOf(loaded: DataFrame): DataFrame = {
    val spark = loaded.sparkSession
    import spark.implicits._
    loaded.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        val bytes = if (path.endsWith(".gz")) gunzipAll(raw) else raw
        parseWetBytes(path, bytes).zipWithIndex.map {
          case ((u, d, t), i) => (path, i, u, d, t) }
      }
      .toDF("wet_file", "record_ix", "url", "__date", "text")
      .withColumn("record_ts", parseWarcDate(col("__date")))
      .select(col("wet_file"), col("record_ix"), col("url"),
        col("record_ts"), col("text"))
  }

  // ───────────────────────── WARC `response` (raw crawl) ──────────────────
  // RefinedWeb-class pipelines start ONE step before WET: at the raw WARC
  // response records (full HTTP exchange, HTML body, original bytes in the
  // original charset). This half of the file ingests those: HTTP envelope
  // parse (status/headers), transfer/content decoding (chunked, gzip),
  // charset SNIFF (BOM → HTTP header → HTML meta → UTF-8 fallback) and a
  // replacement-safe decode — so legacy-charset pages (a real fraction of
  // any crawl) arrive as correct text instead of U+FFFD soup polluting the
  // quality/langid stats downstream (r15 verdict missing #1/#3).

  /** Parse an HTTP response payload: (status, lowercased headers, body
    * bytes after transfer/content decoding). `Transfer-Encoding: chunked`
    * is de-chunked; `Content-Encoding: gzip/x-gzip` is inflated (the
    * multi-member-aware stream). A payload that does not start with
    * `HTTP/` is returned whole with status 0 (some crawlers store bare
    * bodies) — never dropped silently.
    */
  private[sources] def parseHttpResponse(payload: Array[Byte])
      : (Int, Map[String, String], Array[Byte]) = {
    val n = payload.length
    def startsWithHttp: Boolean =
      n >= 5 && payload(0) == 'H' && payload(1) == 'T' &&
        payload(2) == 'T' && payload(3) == 'P' && payload(4) == '/'
    if (!startsWithHttp) return (0, Map.empty, payload)
    // header/body split: first CRLFCRLF
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < n) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return (0, Map.empty, payload)
    val head = new String(payload, 0, split, "ISO-8859-1") // bytes 1:1
    val lines = head.split("\r\n")
    // tolerant status parse: an empty token (double space in the status
    // line) passes a vacuous forall, and an over-long digit run overflows
    // toInt — either would throw in an executor and abort the whole
    // ingest for one sloppy server; both degrade to 0 instead
    val status = lines.head.split(" ") match {
      case a if a.length >= 2 && a(1).nonEmpty && a(1).length <= 9 &&
          a(1).forall(_.isDigit) => a(1).toInt
      case _ => 0
    }
    val headers = lines.drop(1).flatMap { l =>
      val j = l.indexOf(':')
      if (j < 0) None
      else Some(l.substring(0, j).trim.toLowerCase -> l.substring(j + 1).trim)
    }.toMap
    var body = java.util.Arrays.copyOfRange(payload, split + 4, n)
    if (headers.get("transfer-encoding").exists(
        _.toLowerCase.contains("chunked")))
      body = dechunk(body)
    if (headers.get("content-encoding").exists(e =>
        e.equalsIgnoreCase("gzip") || e.equalsIgnoreCase("x-gzip")))
      body = try gunzipAll(body) catch { case _: Exception => body }
    (status, headers, body)
  }

  /** De-chunk an HTTP/1.1 chunked body. Tolerant: a malformed chunk
    * header stops the walk and returns what was assembled so far plus
    * nothing — a truncated page is still a page.
    */
  private[sources] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var off = 0
    val n = body.length
    var ok = true
    while (ok && off < n) {
      // chunk-size line: hex digits up to CRLF (chunk extensions after ';')
      var e = off
      while (e + 1 < n && !(body(e) == '\r' && body(e + 1) == '\n')) e += 1
      if (e + 1 >= n) ok = false
      else {
        val line = new String(body, off, e - off, "ISO-8859-1")
        val hexStr = line.takeWhile(c => c != ';').trim
        val size = try java.lang.Long.parseLong(hexStr, 16).toInt
          catch { case _: NumberFormatException => -1 }
        if (size < 0) ok = false
        else if (size == 0) { ok = false } // terminal chunk; trailers ignored
        else {
          val ds = e + 2
          if (ds + size > n) { out.write(body, ds, n - ds); ok = false }
          else { out.write(body, ds, size); off = ds + size + 2 } // skip CRLF
        }
      }
    }
    out.toByteArray
  }

  private val MetaCharsetRe =
    ("""(?i)<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""").r

  /** Charset sniff, in trust order: byte-order mark → HTTP Content-Type
    * `charset=` parameter → HTML `<meta charset=…>` / http-equiv form
    * (scanned in the first 2048 bytes, decoded as Latin-1 — charset
    * names are ASCII) → `utf-8` as the documented last resort. Returns
    * a canonical java.nio charset name; an unknown/unsupported label
    * falls through to the next source rather than failing the record.
    */
  private[sources] def sniffCharset(contentType: Option[String],
                                    body: Array[Byte]): String = {
    def supported(name: String): Option[String] =
      try {
        val c = java.nio.charset.Charset.forName(name.trim)
        Some(c.name())
      } catch { case _: Exception => None }
    // 1. BOM
    val bom =
      if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
          (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf) Some("UTF-8")
      else if (body.length >= 2 && (body(0) & 0xff) == 0xfe &&
          (body(1) & 0xff) == 0xff) Some("UTF-16BE")
      else if (body.length >= 2 && (body(0) & 0xff) == 0xff &&
          (body(1) & 0xff) == 0xfe) Some("UTF-16LE")
      else None
    // 2. HTTP header parameter
    def fromHeader: Option[String] = contentType.flatMap { ct =>
      val m = """(?i)charset\s*=\s*"?([A-Za-z0-9_\-]+)""".r
        .findFirstMatchIn(ct)
      m.flatMap(g => supported(g.group(1)))
    }
    // 3. HTML meta (first 2KB; Latin-1 decode is byte-transparent)
    def fromMeta: Option[String] = {
      val headLen = math.min(body.length, 2048)
      val head = new String(body, 0, headLen, "ISO-8859-1")
      MetaCharsetRe.findFirstMatchIn(head).flatMap(g => supported(g.group(1)))
    }
    bom.orElse(fromHeader).orElse(fromMeta).getOrElse("UTF-8")
  }

  /** Decode bytes in `charsetName` with U+FFFD replacement for malformed
    * or unmappable sequences — text entering the engine is always valid
    * UTF-16/UTF-8, upholding the native-kernel input contract.
    */
  private[sources] def decodeWith(body: Array[Byte],
                                  charsetName: String): String = {
    val cs = try java.nio.charset.Charset.forName(charsetName)
      catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(body)).toString
  }

  /** Drop a leading byte-order mark matching `charsetName` — the JDK's
    * UTF-8/UTF-16BE/UTF-16LE decoders do NOT strip BOMs (only the
    * auto-detecting "UTF-16" does), so a BOM-sniffed page would
    * otherwise carry a stray U+FEFF as its first text character,
    * polluting fingerprints and token stats.
    */
  private[sources] def stripBom(body: Array[Byte],
                                charsetName: String): Array[Byte] =
    charsetName match {
      case "UTF-8" if body.length >= 3 && (body(0) & 0xff) == 0xef &&
          (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf =>
        java.util.Arrays.copyOfRange(body, 3, body.length)
      case "UTF-16BE" if body.length >= 2 && (body(0) & 0xff) == 0xfe &&
          (body(1) & 0xff) == 0xff =>
        java.util.Arrays.copyOfRange(body, 2, body.length)
      case "UTF-16LE" if body.length >= 2 && (body(0) & 0xff) == 0xff &&
          (body(1) & 0xff) == 0xfe =>
        java.util.Arrays.copyOfRange(body, 2, body.length)
      case _ => body
    }

  /** Per-file task body of [[readWarc]]: every `response` record parsed
    * to (uri, dateStr, httpStatus, contentType, charset, html).
    */
  private[sources] def parseWarcResponseBytes(path: String,
                                              bytes: Array[Byte])
      : Seq[(String, String, Int, String, String, String)] =
    walkWarcRecords(path, bytes, isType("response")).map {
      case (fields, payload) =>
        val (status, headers, body) = parseHttpResponse(payload)
        val ct = headers.getOrElse("content-type", "")
        val cs = sniffCharset(headers.get("content-type"), body)
        (fields.getOrElse("warc-target-uri", ""),
          fields.getOrElse("warc-date", ""),
          status, ct, cs, decodeWith(stripBom(body, cs), cs))
    }

  /** Read raw-crawl WARC files under `dir` as `(warc_file, record_ix,
    * url, record_ts, http_status, content_type, charset, html)` — one
    * row per `response` record (`warcinfo`/`request`/`metadata`/
    * `conversion` skipped by type), the step BEFORE WET in a
    * RefinedWeb-class pipeline: the engine ingests the original crawl
    * bytes, sniffs the page charset (BOM → header → meta → UTF-8), and
    * hands back correctly-decoded HTML for
    * [[graft.text.TextFunctions.stripMarkup]] + the curation chain
    * (CLI `dedup --warc`). Same scale shape as [[readWet]]: one task
    * per file via binaryFile, in-task gunzip, Content-Length record
    * slicing (reference analog: the pipeline ingests raw object bytes
    * and decodes in-loader, common/dataset.py:271-281).
    */
  def readWarc(spark: SparkSession, dir: String,
               glob: String = "*.warc*"): DataFrame =
    warcRowsOf(spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir))

  /** STREAMING twin of [[readWarc]] — the raw-crawl drop-directory
    * watcher ([[readWetStream]]'s rationale; same stateless per-file
    * walk, envelope parse, and charset sniff).
    */
  def readWarcStream(spark: SparkSession, dir: String,
                     glob: String = "*.warc*"): DataFrame =
    warcRowsOf(spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", glob).load(dir))

  /** (path, content) → response rows — shared by [[readWarc]] and
    * [[readWarcStream]]. */
  private def warcRowsOf(loaded: DataFrame): DataFrame = {
    val spark = loaded.sparkSession
    import spark.implicits._
    loaded.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        val bytes = if (path.endsWith(".gz")) gunzipAll(raw) else raw
        parseWarcResponseBytes(path, bytes).zipWithIndex.map {
          case ((u, d, st, ct, cs, h), i) => (path, i, u, d, st, ct, cs, h) }
      }
      .toDF("warc_file", "record_ix", "url", "__date", "http_status",
        "content_type", "charset", "html")
      .withColumn("record_ts", parseWarcDate(col("__date")))
      .select(col("warc_file"), col("record_ix"), col("url"),
        col("record_ts"), col("http_status"), col("content_type"),
        col("charset"), col("html"))
  }

  /** Per-file task body of [[readWarcBinary]]: every `response` record's
    * RAW body bytes after transfer/content decoding — no charset decode
    * (the payload may be an image/audio/any blob, not text).
    */
  private[sources] def parseWarcBinaryBytes(path: String,
                                            bytes: Array[Byte])
      : Seq[(String, String, Int, String, Array[Byte])] =
    walkWarcRecords(path, bytes, isType("response")).map {
      case (fields, payload) =>
        val (status, headers, body) = parseHttpResponse(payload)
        (fields.getOrElse("warc-target-uri", ""),
          fields.getOrElse("warc-date", ""),
          status, headers.getOrElse("content-type", ""), body)
    }

  /** [[readWarc]]'s BINARY sibling: `(warc_file, record_ix, url,
    * record_ts, http_status, content_type, content)` with the response
    * body as raw bytes — the ingest for NON-TEXT crawl payloads (a raw
    * crawl carries images, audio, PDFs alongside HTML; charset-decoding
    * those corrupts them). The `content` column drops straight into the
    * engine's multimodal family: magic-byte sniff (u1), dHash / audio /
    * video fingerprints, perceptual near-dup banding — crawl → decode →
    * fingerprint → cluster without leaving the engine. Same per-file
    * task shape; same chunked/gzip HTTP unwrapping as the text reader.
    */
  def readWarcBinary(spark: SparkSession, dir: String,
                     glob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        val bytes = if (path.endsWith(".gz")) gunzipAll(raw) else raw
        parseWarcBinaryBytes(path, bytes).zipWithIndex.map {
          case ((u, d, st, ct, b), i) => (path, i, u, d, st, ct, b) }
      }
      .toDF("warc_file", "record_ix", "url", "__date", "http_status",
        "content_type", "content")
      .withColumn("record_ts", parseWarcDate(col("__date")))
      .select(col("warc_file"), col("record_ix"), col("url"),
        col("record_ts"), col("http_status"), col("content_type"),
        col("content"))
  }

  /** Fixture writer for BINARY `response` records — [[writeWarcShards]]
    * with a bytes body and a caller-supplied Content-Type (image/png,
    * application/pdf, …). Deterministic like every fixture writer here.
    */
  def writeWarcBinaryShards(df: DataFrame, urlCol: String, tsCol: String,
                            bodyCol: String, contentTypeCol: String,
                            dir: String, numShards: Int): Unit = {
    require(numShards >= 1, s"numShards $numShards < 1")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(urlCol).cast("string").as("__u"),
        col(tsCol).cast("timestamp").as("__d"),
        col(bodyCol).cast("binary").as("__b"),
        col(contentTypeCol).cast("string").as("__ct"))
      .withColumn("__shard", pmod(xxhash64(col("__u")), lit(numShards.toLong)))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions("__shard", "__u")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(conf.value)
        var cur = -1L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        rows.foreach { r =>
          val shard = r.getLong(4)
          if (shard != cur) {
            close(); cur = shard
            val name = f"shard-$shard%05d.warc"
            out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
            out.write(warcinfoRecord(name, "2024-01-01T00:00:00Z"))
          }
          require(r.getString(0) != null && !r.isNullAt(1) &&
            !r.isNullAt(2) && r.getString(3) != null,
            "writeWarcBinaryShards: null url, ts, body, or content type")
          out.write(responseRecord(r.getString(0),
            ZuluFmt.format(r.getTimestamp(1).toInstant),
            r.getString(3), r.getAs[Array[Byte]](2)))
        }
        close()
      }
  }

  /** One serialized WARC `response` record for the fixture writer: the
    * payload is a full HTTP/1.1 envelope + body bytes (encoded by the
    * caller in the page's charset — the reader must sniff it back).
    */
  private[sources] def responseRecord(uri: String, date: String,
                                      contentType: String,
                                      body: Array[Byte]): Array[Byte] = {
    val http =
      (s"HTTP/1.1 200 OK${Crlf}" +
        s"Content-Type: $contentType${Crlf}" +
        s"Content-Length: ${body.length}${Crlf}" +
        Crlf).getBytes("ISO-8859-1") ++ body
    val recId = java.util.UUID.nameUUIDFromBytes(
      ("response|" + uri).getBytes("UTF-8")).toString
    val header =
      s"WARC/1.0${Crlf}" +
        s"WARC-Type: response${Crlf}" +
        s"WARC-Target-URI: $uri${Crlf}" +
        s"WARC-Date: $date${Crlf}" +
        s"WARC-Record-ID: <urn:uuid:$recId>${Crlf}" +
        s"Content-Type: application/http; msgtype=response${Crlf}" +
        s"Content-Length: ${http.length}${Crlf}" +
        Crlf
    val h = header.getBytes("UTF-8")
    val out = new Array[Byte](h.length + http.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(http, 0, out, h.length, http.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Write (url, ts, html[, charset]) rows as `numShards` raw-crawl WARC
    * files — the [[writeWetShards]] fixture discipline applied to
    * `response` records: deterministic shard membership / record order /
    * record ids, UTC wire dates. `charsetCol` (nullable) drives BOTH the
    * body encoding and the HTTP Content-Type: a non-null charset encodes
    * the body in it and declares `text/html; charset=<cs>`; a NULL
    * charset writes UTF-8 with a bare `text/html` header, so the reader
    * must sniff the page's `<meta charset>` — the two sniff paths stay
    * separately pinned by the s19 oracle. Unmappable characters encode
    * as '?' (the JDK REPLACE action) — fixture callers pass mappable
    * text.
    */
  def writeWarcShards(df: DataFrame, urlCol: String, tsCol: String,
                      htmlCol: String, charsetCol: Option[String],
                      dir: String, numShards: Int): Unit = {
    require(numShards >= 1, s"numShards $numShards < 1")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val csCol = charsetCol.map(c => col(c).cast("string"))
      .getOrElse(lit(null).cast("string"))
    df.select(col(urlCol).cast("string").as("__u"),
        col(tsCol).cast("timestamp").as("__d"),
        col(htmlCol).cast("string").as("__t"),
        csCol.as("__cs"))
      .withColumn("__shard", pmod(xxhash64(col("__u")), lit(numShards.toLong)))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions("__shard", "__u")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(conf.value)
        var cur = -1L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        rows.foreach { r =>
          val shard = r.getLong(4)
          if (shard != cur) {
            close(); cur = shard
            val name = f"shard-$shard%05d.warc"
            out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
            out.write(warcinfoRecord(name, "2024-01-01T00:00:00Z"))
          }
          require(r.getString(0) != null && !r.isNullAt(1) &&
            r.getString(2) != null,
            "writeWarcShards: null url, ts, or html")
          val cs = if (r.isNullAt(3)) None else Some(r.getString(3))
          val enc = java.nio.charset.Charset.forName(cs.getOrElse("UTF-8"))
          val ct = cs.map(c => s"text/html; charset=$c")
            .getOrElse("text/html")
          out.write(responseRecord(r.getString(0),
            ZuluFmt.format(r.getTimestamp(1).toInstant),
            ct, r.getString(2).getBytes(enc)))
        }
        close()
      }
  }
}
