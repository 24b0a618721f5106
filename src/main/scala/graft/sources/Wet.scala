package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  def writeWetShards(df: DataFrame, urlCol: String, tsCol: String,
                     textCol: String, dir: String, numShards: Int): Unit = {
    require(numShards >= 1, s"numShards $numShards < 1")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(urlCol).cast("string").as("__u"),
        date_format(col(tsCol).cast("timestamp"),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("__d"),
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
          require(r.getString(0) != null && r.getString(2) != null,
            "writeWetShards: null url or text")
          out.write(conversionRecord(r.getString(0), r.getString(1),
            r.getString(2).getBytes("UTF-8")))
        }
        close()
      }
  }

  /** Parse one in-memory WET byte stream into (uri, dateStr, text) for
    * every `conversion` record — the per-file task body of [[readWet]],
    * split out for direct testing. Payloads are sliced by Content-Length
    * ONLY; malformed records (no blank line, missing Content-Length) fail
    * loudly with the file context rather than desynchronizing the walk.
    */
  private[sources] def parseWetBytes(path: String, bytes: Array[Byte])
      : Seq[(String, String, String)] = {
    val out = Seq.newBuilder[(String, String, String)]
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
          s"readWet: unterminated header block at offset $off in $path")
        val header = new String(bytes, off, hEnd + 2 - off, "UTF-8")
        val lines = header.split("\r\n")
        require(lines.headOption.exists(_.startsWith("WARC/")),
          s"readWet: record at offset $off in $path does not start with " +
            s"a WARC version line (got '${lines.headOption.getOrElse("")}')")
        val fields = lines.drop(1).flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None
          else Some(l.substring(0, i).trim.toLowerCase ->
            l.substring(i + 1).trim)
        }.toMap
        val len = fields.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"readWet: record at offset $off in $path has no " +
              "Content-Length — cannot find the record boundary")).toLong
        val pStart = hEnd + 4
        require(pStart + len <= n,
          s"readWet: truncated payload at offset $off in $path")
        if (fields.get("warc-type").exists(_.equalsIgnoreCase("conversion")))
          out += ((fields.getOrElse("warc-target-uri", ""),
            fields.getOrElse("warc-date", ""),
            new String(bytes, pStart, len.toInt, "UTF-8")))
        off = pStart + len.toInt
      }
    }
    out.result()
  }

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

  /** Read WET files under `dir` as `(wet_file, url, record_ts, text)` —
    * one row per `conversion` record; `warcinfo`/`request`/`response`
    * records are skipped by type. `.gz` files are decompressed in-task.
    * `record_ts` is the parsed WARC-Date (zoned timestamp); rows with an
    * unparseable date carry a null ts rather than dropping (the p7
    * null-drop operator is the caller's explicit choice).
    */
  def readWet(spark: SparkSession, dir: String,
              glob: String = "*.wet*"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, raw) =>
        val bytes = if (path.endsWith(".gz")) gunzipAll(raw) else raw
        parseWetBytes(path, bytes).map { case (u, d, t) => (path, u, d, t) }
      }
      .toDF("wet_file", "url", "__date", "text")
      .withColumn("record_ts",
        to_timestamp(col("__date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .select(col("wet_file"), col("url"), col("record_ts"), col("text"))
  }
}
