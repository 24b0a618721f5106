package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class TarShardsSpec extends SparkSpec {

  import spark.implicits._

  private def fixture(n: Int) = (0 until n).map { i =>
    (f"sample-$i%04d.txt",
      s"payload $i ${"x" * (i % 700)}".getBytes("UTF-8"))
  }.toDF("name", "content")

  test("tar shards round-trip byte-exactly; shard membership is the deterministic hash") {
    val dir = Files.createTempDirectory("tars").toString
    val df = fixture(97).localCheckpoint()
    TarShards.writeTarShards(df, "name", "content", dir, numShards = 5)
    val back = TarShards.readTarShards(spark, dir)
    val got = back.select("name", "content")
      .as[(String, Array[Byte])].collect()
      .map { case (n, c) => n -> c.toSeq }.toMap
    val want = df.as[(String, Array[Byte])].collect()
      .map { case (n, c) => n -> c.toSeq }.toMap
    assert(got === want)
    // exactly one tar per non-empty shard; membership = xxhash64 mod 5
    val files = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".tar")).map(_.getName).sorted
    assert(files.length <= 5 && files.nonEmpty)
    val wantShard = df.select(col("name"),
        pmod(xxhash64(col("name")), lit(5L)).as("s"))
      .as[(String, Long)].collect().toMap
    back.select(col("shard"), col("name")).as[(String, String)].collect()
      .foreach { case (path, name) =>
        assert(path.endsWith(f"shard-${wantShard(name)}%05d.tar"),
          s"$name in $path, want shard ${wantShard(name)}")
      }
  }

  test("writer is deterministic: two runs produce byte-identical shards") {
    val d1 = Files.createTempDirectory("tars1").toString
    val d2 = Files.createTempDirectory("tars2").toString
    // reversed input order must not matter (hash membership + name sort)
    val df = fixture(40).localCheckpoint()
    TarShards.writeTarShards(df, "name", "content", d1, 3)
    TarShards.writeTarShards(df.orderBy(col("name").desc), "name", "content",
      d2, 3)
    val f1 = new java.io.File(d1).listFiles.filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    val f2 = new java.io.File(d2).listFiles.filter(_.getName.endsWith(".tar"))
      .sortBy(_.getName)
    assert(f1.map(_.getName).toSeq === f2.map(_.getName).toSeq)
    f1.zip(f2).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(Files.readAllBytes(a.toPath),
        Files.readAllBytes(b.toPath)), s"${a.getName} differs between runs")
    }
  }

  test("shards are REAL tar: the system tar binary lists every entry") {
    val tarBin = Seq("/bin/tar", "/usr/bin/tar").find(p =>
      new java.io.File(p).canExecute)
    assume(tarBin.isDefined, "no system tar binary on this host")
    val dir = Files.createTempDirectory("tars_interop").toString
    val df = fixture(23).localCheckpoint()
    TarShards.writeTarShards(df, "name", "content", dir, 2)
    val listed = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".tar")).flatMap { f =>
        val proc = new ProcessBuilder(tarBin.get, "-tf", f.getPath)
          .redirectErrorStream(true).start()
        val out = new String(proc.getInputStream.readAllBytes, "UTF-8")
        assert(proc.waitFor() === 0, s"tar -tf ${f.getName} failed:\n$out")
        out.split("\n").filter(_.nonEmpty)
      }.toSet
    assert(listed === df.select("name").as[String].collect().toSet)
    // and tar -x extracts byte-identical payloads (spot-check one shard)
    val extractDir = Files.createTempDirectory("tars_x")
    val shard = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".tar")).head
    val px = new ProcessBuilder(tarBin.get, "-xf", shard.getPath,
      "-C", extractDir.toString).redirectErrorStream(true).start()
    assert(px.waitFor() === 0)
    val wantBytes = df.as[(String, Array[Byte])].collect().toMap
    extractDir.toFile.listFiles.foreach { f =>
      assert(java.util.Arrays.equals(Files.readAllBytes(f.toPath),
        wantBytes(f.getName)), s"${f.getName} extracted bytes differ")
    }
  }

  test("empty payloads and the 100-byte name limit") {
    val dir = Files.createTempDirectory("tars_edge").toString
    val df = Seq(("empty.bin", Array.empty[Byte]),
      ("a" * 96 + ".txt", "x".getBytes("UTF-8")))
      .toDF("name", "content")
    TarShards.writeTarShards(df, "name", "content", dir, 1)
    val back = TarShards.readTarShards(spark, dir)
      .select("name", "content").as[(String, Array[Byte])].collect().toMap
    assert(back("empty.bin").isEmpty && back("a" * 96 + ".txt").length === 1)
    val tooLong = Seq(("b" * 101, "x".getBytes("UTF-8"))).toDF("name", "content")
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.writeTarShards(tooLong, "name", "content",
        Files.createTempDirectory("tars_long").toString, 1)
    }
    assert(e.getMessage.contains("100 bytes") ||
      Option(e.getCause).exists(_.getMessage.contains("100 bytes")))
  }
}
