package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style TAR SHARDS — the PyTorch-world interchange layout for
  * multimodal training samples (one tar per shard, one or more files per
  * sample, samples readable sequentially with zero per-file open cost on
  * object stores). The reference's training loaders stream samples from
  * object storage one key at a time (train/common/dataset.py:73-81,
  * train_stage_1/dataloader.py:26-41) — at 100 TB that per-object GET is
  * the bottleneck, and tar-sharding is the standard fix: sequential reads
  * of ~shard-sized objects, shard count = read parallelism.
  *
  * The writer emits PLAIN POSIX ustar (no compression): headers are
  * deterministic (mode 0644, uid/gid 0, mtime 0), so the same input
  * produces byte-identical shards — the reproducibility property a
  * resumable training run addresses shards by. Compatibility with real
  * `tar` is asserted in TarShardsSpec by listing a shard with the system
  * binary.
  *
  * Scale shape: one hash shuffle of the (name, payload) rows on the shard
  * id, an in-partition sort by (shard, name), and ONE sequential write
  * per shard (a partition holds whole shards only — hash partitioning on
  * the shard id cannot split one). No driver-side anything; shard count
  * is the only knob (size it so shards land in the 100 MB–1 GB object-
  * store sweet spot).
  */
object TarShards {

  /** One POSIX ustar header block (512 bytes) for a regular file. */
  private[multimodal] def tarHeader(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes("US-ASCII")
    require(nameBytes.length <= 100, s"tar entry name over 100 bytes: $name")
    require(size >= 0, s"negative entry size for $name")
    val h = new Array[Byte](512)
    def put(s: String, off: Int): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(name, 0)
    put("0000644\u0000", 100)              // mode
    put("0000000\u0000", 108)              // uid
    put("0000000\u0000", 116)              // gid
    put(f"$size%011o" + "\u0000", 124)     // size, octal
    put("00000000000\u0000", 136)          // mtime 0 — deterministic
    put("        ", 148)                   // chksum field = spaces for the sum
    h(156) = '0'                           // typeflag: regular file
    put("ustar\u000000", 257)              // magic + version
    val sum = h.map(_ & 0xff).sum
    put(f"$sum%06o" + "\u0000 ", 148)
    h
  }

  private def paddedLen(n: Long): Long = ((n + 511) / 512) * 512

  /** Write (name, payload) rows as `numShards` tar shards under `dir`
    * (`shard-00000.tar`, ...). Shard membership is `xxhash64(name) mod
    * numShards` — deterministic and input-order-independent — and entries
    * inside each tar are name-sorted, so two runs over the same rows
    * produce byte-identical shards. Names must be unique and ≤ 100 ASCII
    * bytes (the ustar limit; WebDataset sample naming — `<key>.<ext>` —
    * fits comfortably).
    */
  def writeTarShards(df: DataFrame, nameCol: String, contentCol: String,
                     dir: String, numShards: Int): Unit = {
    require(numShards >= 1, s"numShards $numShards < 1")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col(nameCol).cast("string").as("__name"), col(contentCol).as("__c"))
      .withColumn("__shard", pmod(xxhash64(col("__name")), lit(numShards.toLong)))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions("__shard", "__name")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(conf.value)
        var cur = -1L
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // two zero blocks: end of archive
          out.close(); out = null
        }
        rows.foreach { r =>
          val shard = r.getLong(2)
          if (shard != cur) { // whole shards per partition: open the next
            close(); cur = shard
            out = fs.create(new org.apache.hadoop.fs.Path(dir,
              f"shard-$shard%05d.tar"), true)
          }
          val payload = r.getAs[Array[Byte]](1)
          // fail BEFORE any byte of the entry is written: a null payload
          // surfacing as an NPE mid-archive would leave a torn shard
          require(payload != null,
            s"writeTarShards: null $contentCol for entry '${r.getString(0)}'")
          out.write(tarHeader(r.getString(0), payload.length.toLong))
          out.write(payload)
          val pad = (paddedLen(payload.length.toLong) - payload.length).toInt
          if (pad > 0) out.write(new Array[Byte](pad))
        }
        close()
      }
  }

  /** Read tar shards back as (shard, name, content) — the consumer side
    * of [[writeTarShards]], and a reader for any plain ustar/GNU tar of
    * regular files. One ENTRY-STREAMING task per shard (a tar is a
    * sequential format; the shard IS the split unit, which is the point
    * of the layout): the path manifest fans out and each task walks
    * 512-byte header blocks off a Hadoop stream ([[walkTarEntries]] —
    * peak memory one entry, shards of any size; `.gz` names inflate in
    * flight). Zero-block terminated; non-regular entries (directories,
    * PAX/long-name extensions) are skipped UNREAD, not errors.
    */
  def readTarShards(spark: SparkSession, dir: String,
                    glob: String = "*.tar"): DataFrame = {
    import spark.implicits._
    val conf = graft.sources.Wet.serConf(spark)
    graft.sources.Wet.fileTasks(spark,
        graft.sources.Wet.listFiles(spark, dir, glob))
      .flatMap { path =>
        val in = graft.sources.Wet.openRecordStream(path, conf.value)
        graft.sources.Wet.closeOnTaskEnd(in)
        walkTarEntries(path, in)
      }.toDF("shard", "name", "content")
  }

  /** ENTRY-STREAMING ustar walk (the r17 record-streaming discipline,
    * [[graft.sources.Wet.walkWarcStream]]'s sibling): 512-byte header
    * blocks read incrementally, one entry's bytes resident at a time —
    * the previous binaryFile form held the whole shard PLUS every
    * extracted entry simultaneously (2-3× shard residency and the 2 GiB
    * content ceiling). Non-regular-file entries are SKIPPED unread.
    * A single entry ≥2 GB still fails loudly (no such WebDataset entry
    * exists; a silent Int narrow would corrupt every later offset).
    */
  private def walkTarEntries(path: String, in: java.io.InputStream)
      : Iterator[(String, String, Array[Byte])] =
    new Iterator[(String, String, Array[Byte])] {
      private val hdr = new Array[Byte](512)
      private var pending: (String, String, Array[Byte]) = null
      private var exhausted = false

      private def readFully(buf: Array[Byte], len: Int,
                            what: String): Boolean = {
        var got = 0
        while (got < len) {
          val r = in.read(buf, got, len - got)
          if (r < 0) {
            require(got == 0 || what != "header",
              s"readTarShards: truncated $what in $path")
            return false
          }
          got += r
        }
        true
      }

      private def skipFully(len: Long): Unit = {
        var left = len
        if (left > 0) {
          val buf = new Array[Byte](math.min(left, 65536L).toInt)
          while (left > 0) {
            val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
            require(r >= 0, s"readTarShards: truncated entry in $path")
            left -= r
          }
        }
      }

      private def str(o: Int, len: Int): String = {
        var end = o
        while (end < o + len && hdr(end) != 0) end += 1
        new String(hdr, o, end - o, "US-ASCII")
      }

      private def advance(): Unit = {
        while (pending == null && !exhausted) {
          if (!readFully(hdr, 512, "header")) { exhausted = true }
          else {
            val name = str(0, 100)
            if (name.isEmpty) exhausted = true // zero block: end of archive
            else {
              val size = java.lang.Long.parseLong(str(124, 12).trim, 8)
              require(size >= 0 && size <= Int.MaxValue - 512,
                s"readTarShards: entry '$name' in $path has size $size " +
                  "outside the supported [0, 2GB) range")
              val pad = ((size + 511) / 512) * 512 - size
              val typeflag = hdr(156)
              if (typeflag == '0' || typeflag == 0) {
                val content = new Array[Byte](size.toInt)
                require(readFully(content, size.toInt, "entry"),
                  s"readTarShards: truncated entry '$name' in $path")
                skipFully(pad)
                pending = (path, name, content)
              } else skipFully(size + pad)
            }
          }
        }
      }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): (String, String, Array[Byte]) = {
        advance()
        if (pending == null) throw new NoSuchElementException(path)
        val r = pending; pending = null; r
      }
    }
}
