package graft.queries

import graft.core.Tables
import graft.multimodal.Multimodal._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) queries — oracle-checkable forms of the byte
  * operators (SURVEY S4/S6/U1). Payload bytes are synthesized from the
  * documents table inside the query (cast text → binary, or construct real
  * PNG headers from numeric columns) so the DuckDB oracle can recompute
  * every result from the same parquet inputs; the binary operators under
  * test (md5/length/magic-sniff/header-parse) are exactly the production
  * expressions from graft.multimodal.Multimodal. The true file-based
  * binaryFile source and the mapPartitions decode edge are exercised in
  * MultimodalSpec (files on disk are not visible to the oracle).
  */
object QMultimodal {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4: whole-object fetch shape — byte fingerprint + length of a binary
    // payload column, no decode.
    "s4_binary_md5" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("content", col("text").cast("binary"))
        .select(col("doc_id"),
          contentMd5(col("content")).as("content_md5"),
          contentLength(col("content")).as("n_bytes"))),

    // U1a: PNG header round-trip — serialize (width, height) derived from
    // table columns into a real PNG/IHDR byte prefix, then parse the
    // dimensions back with the header-parse expressions. Proves the
    // byte-level parser without needing image files.
    "u1_png_dims" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("content",
          pngHeader(col("n_chars") % 4000 + 1, (col("doc_id") % 2000) + 1))
        .select(col("doc_id"),
          magicFormat(col("content")).as("fmt"),
          pngWidth(col("content")).as("width"),
          pngHeight(col("content")).as("height"))),

    // S4/S8 round-trip through REAL files: blobSink writes each doc's
    // bytes to a file from the executors, binarySource (binaryFile) reads
    // them back; the oracle recomputes name/length/md5 from the documents
    // table. Proves the file source + sink end-to-end, not just the byte
    // expressions. Bounded to 200 files.
    "s4b_blob_roundtrip" -> ((s, d) => {
      val dir = s"/root/repo/target/fixtures/${new java.io.File(d).getName}/blobs"
      // clear stale files from prior versions/runs: the read lists the dir
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      blobSink(
        t(s, d, "documents").filter(col("doc_id") < 200)
          .select(concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
            col("text").cast("binary").as("content")),
        "name", "content", dir)
      binarySource(s, dir, "*.txt")
        .select(element_at(split(col("path"), "/"), -1).as("name"),
          col("length").as("n_bytes"),
          contentMd5(col("content")).as("content_md5"))
    }),

    // U1b: magic-byte format sniff across mixed payloads (png / jpeg /
    // npy / opaque bytes) synthesized per-language. The fallthrough branch
    // is NUL-prefixed so natural text starting with an ASCII magic ("BM",
    // "GIF8", "RIFF") cannot make the engine-side sniff diverge from the
    // oracle's per-language CASE.
    "u1_magic_sniff" -> ((s, d) =>
      t(s, d, "documents")
        .withColumn("content",
          when(col("lang") === "en", pngHeader(lit(128), lit(64)))
            .when(col("lang") === "fr", unhex(lit("FFD8FFE000104A46494600")))
            .when(col("lang") === "de", unhex(lit("934E554D505901006600")))
            .otherwise(concat(unhex(lit("00")), col("text").cast("binary"))))
        .select(col("doc_id"), col("lang"),
          magicFormat(col("content")).as("fmt"),
          contentLength(col("content")).as("n_bytes"))))

  def oracle: Map[String, String] = Map(
    "s4_binary_md5" ->
      """SELECT doc_id, md5(text) AS content_md5,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes
         FROM documents""",
    "u1_png_dims" ->
      """SELECT doc_id, 'png' AS fmt,
                CAST(n_chars % 4000 + 1 AS INT) AS width,
                CAST(doc_id % 2000 + 1 AS INT) AS height
         FROM documents""",
    "s4b_blob_roundtrip" ->
      """SELECT CAST(doc_id AS VARCHAR) || '.txt' AS name,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS content_md5
         FROM documents WHERE doc_id < 200""",
    "u1_magic_sniff" ->
      """SELECT doc_id, lang,
                CASE lang WHEN 'en' THEN 'png' WHEN 'fr' THEN 'jpeg'
                          WHEN 'de' THEN 'npy' ELSE 'unknown' END AS fmt,
                CASE lang WHEN 'en' THEN 24 WHEN 'fr' THEN 11 WHEN 'de' THEN 10
                          ELSE CAST(octet_length(encode(text)) + 1 AS INT) END AS n_bytes
         FROM documents""")
}
