package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract tests for the scratch-parquet materialization that replaced
  * localCheckpoint in the two-phase distributed machinery (Sampling rank
  * forms, Planners cumsum forms) after the 40M-row object-block cliff was
  * measured (MaintProbe budgetdiag, SURVEY §6.3).
  */
class ScratchSpec extends SparkSpec {
  import spark.implicits._

  // The file-source read widens fields to nullable (Scratch scaladoc), so
  // schema assertions compare names + types, not nullability.
  private def namesAndTypes(df: org.apache.spark.sql.DataFrame) =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq

  test("materialize round-trips rows, names and types") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val m = Scratch.materialize(df, "spec")
    assert(namesAndTypes(m) === namesAndTypes(df))
    assert(m.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }

  test("empty relation round-trips (explicit schema, no inference failure)") {
    val df = Seq((1L, "a")).toDF("id", "s").filter(col("id") < 0)
    val m = Scratch.materialize(df, "spec")
    assert(m.count() === 0L)
    assert(namesAndTypes(m) === namesAndTypes(df))
  }

  test("nondeterministic columns are frozen: two consuming jobs see identical values") {
    // The reason Scratch exists instead of plain persist(): __pid / mid
    // columns must not be recomputed differently per consuming job.
    val m = Scratch.materialize(
      spark.range(1000).repartition(4)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__mid", monotonically_increasing_id()), "spec")
    val a = m.select(sum(col("__mid")), max(col("__pid"))).collect()
    val b = m.select(sum(col("__mid")), max(col("__pid"))).collect()
    assert(a.toSeq === b.toSeq)
    assert(m.count() === 1000L)
  }

  test("graft.scratch.dir conf routes the write (and is created on demand)") {
    val base = java.nio.file.Files.createTempDirectory("scratchbase")
      .resolve("nested").toString
    spark.conf.set("graft.scratch.dir", base)
    try {
      val m = Scratch.materialize(spark.range(10).toDF(), "spec")
      assert(m.count() === 10L)
      val subdirs = new java.io.File(base).listFiles()
      assert(subdirs != null && subdirs.exists(_.getName.startsWith("graft_spec")))
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("materializeWithHandle: drop() reclaims that dir early, leaves others") {
    val base = java.nio.file.Files.createTempDirectory("scratchhandle").toString
    spark.conf.set("graft.scratch.dir", base)
    try {
      val (a, ha) = Scratch.materializeWithHandle(spark.range(5).toDF(), "ha")
      val (b, _) = Scratch.materializeWithHandle(spark.range(7).toDF(), "hb")
      assert(a.count() === 5L && b.count() === 7L)
      ha.drop()
      val left = new java.io.File(base).listFiles().map(_.getName)
      assert(!left.exists(_.startsWith("graft_ha")))
      assert(left.exists(_.startsWith("graft_hb")))
      assert(b.count() === 7L) // survivor still readable after the drop
    } finally spark.conf.unset("graft.scratch.dir")
  }

  test("cleanupNow deletes every scratch dir written so far") {
    val base = java.nio.file.Files.createTempDirectory("scratchclean").toString
    spark.conf.set("graft.scratch.dir", base)
    try {
      val m = Scratch.materialize(spark.range(10).toDF(), "spec")
      assert(m.count() === 10L)
      Scratch.cleanupNow()
      val left = new java.io.File(base).listFiles()
      assert(left == null || left.isEmpty)
    } finally spark.conf.unset("graft.scratch.dir")
  }
}
