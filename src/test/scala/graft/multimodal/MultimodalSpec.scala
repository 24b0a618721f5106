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

  test("decodeImages (mapPartitions edge) parses headers and is deterministic") {
    val files = Multimodal.binarySource(spark, dir, "*.png")
    val got = Multimodal.decodeImages(files).collect()
      .map(d => d.path.split("/").last -> d).toMap
    assert(got("a.png").width === 640 && got("a.png").height === 480)
    assert(got("b.png").width === 1024 && got("b.png").height === 768)
    val again = Multimodal.decodeImages(files).collect()
      .map(d => d.path.split("/").last -> d).toMap
    assert(got("a.png").meanLuma === again("a.png").meanLuma)
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
