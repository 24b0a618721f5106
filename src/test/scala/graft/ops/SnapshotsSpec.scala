package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {

  import spark.implicits._

  test("readAsOf replays the MERGE chain: LWW per key, deletes, re-insert resurrection, epoch pruning") {
    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    // v0: keys 1..4; v1: update 2, delete 3; v2: resurrect 3, insert 5
    Snapshots.writeEpoch(
      Seq((1L, "a", false), (2L, "b", false), (3L, "c", false), (4L, "d", false))
        .toDF("k", "val", "_deleted"), dir, 0)
    Snapshots.writeEpoch(
      Seq((2L, "b2", false), (3L, "c", true)).toDF("k", "val", "_deleted"), dir, 1)
    Snapshots.writeEpoch(
      Seq((3L, "c3", false), (5L, "e", false)).toDF("k", "val", "_deleted"), dir, 2)

    def snap(v: Int): Map[Long, String] =
      Snapshots.readAsOf(spark, dir, Seq("k"), v)
        .as[(Long, String)].collect().toMap

    assert(snap(0) === Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    assert(snap(1) === Map(1L -> "a", 2L -> "b2", 4L -> "d")) // 3 deleted
    assert(snap(2) === Map(1L -> "a", 2L -> "b2", 3L -> "c3", 4L -> "d", 5L -> "e"))
    assert(Snapshots.versions(spark, dir) === Seq(0, 1, 2))

    // the _v <= V cut is partition pruning: an asOf(0) scan lists only
    // the _v=0 directory (later epochs never read)
    val plan = spark.read.parquet(dir).filter(col("_v") <= 0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(_v"), plan)
  }

  test("compactTo drops history below V, preserves every snapshot at/after V") {
    val dir = java.nio.file.Files.createTempDirectory("snap3").toString
    Snapshots.writeEpoch(
      Seq((1L, "a", false), (2L, "b", false), (3L, "c", false), (4L, "d", false))
        .toDF("k", "val", "_deleted"), dir, 0)
    Snapshots.writeEpoch(
      Seq((2L, "b2", false), (3L, "c", true)).toDF("k", "val", "_deleted"), dir, 1)
    Snapshots.writeEpoch(
      Seq((3L, "c3", false), (5L, "e", false)).toDF("k", "val", "_deleted"), dir, 2)
    def snap(v: Int): Map[Long, String] =
      Snapshots.readAsOf(spark, dir, Seq("k"), v)
        .as[(Long, String)].collect().toMap
    val (at1, at2) = (snap(1), snap(2))
    Snapshots.compactTo(spark, dir, Seq("k"), 1)
    assert(Snapshots.versions(spark, dir) === Seq(1, 2))
    // snapshots at and after the compaction point are byte-for-byte stable
    // (the delete of 3 at v1 is now baked into the base; v2 resurrects it)
    assert(snap(1) === at1)
    assert(snap(2) === at2)
  }

  test("compactTo under a concurrent reader: a pre-planned readAsOf succeeds or fails loud, never silently wrong") {
    val dir = java.nio.file.Files.createTempDirectory("snapconc").toString
    Snapshots.writeEpoch(Seq((1L, "a"), (2L, "b")).toDF("k", "val"), dir, 0)
    Snapshots.writeEpoch(Seq((2L, "b2"), (3L, "c")).toDF("k", "val"), dir, 1)
    Snapshots.writeEpoch(Seq((4L, "d")).toDF("k", "val"), dir, 2)
    val expected = Snapshots.readAsOf(spark, dir, Seq("k"), 1)
      .as[(Long, String)].collect().toMap
    // a reader plans asOf(1) (file listing captured at plan time), then a
    // compaction to v=2 deletes the _v=0 and _v=1 directories under it
    val planned = Snapshots.readAsOf(spark, dir, Seq("k"), 1)
    planned.queryExecution.executedPlan // force planning before the swap
    Snapshots.compactTo(spark, dir, Seq("k"), 2)
    // single-writer is the documented contract; for a concurrent READER
    // the guarantee is weaker but real: the pre-planned scan either still
    // returns the correct snapshot or throws (missing files) — an empty
    // or partial result would be the silent-corruption case
    scala.util.Try(planned.as[(Long, String)].collect().toMap) match {
      case scala.util.Success(m) => assert(m === expected, "silently wrong snapshot")
      case scala.util.Failure(_) => () // loud failure: acceptable
    }
    // a FRESH asOf below the compaction point is documented-gone history:
    // it fails loud (guard in readAsOf), never an empty fabricated snapshot
    val e = intercept[IllegalArgumentException] {
      Snapshots.readAsOf(spark, dir, Seq("k"), 1)
    }
    assert(e.getMessage.contains("compaction"))
  }

  test("property: random epoch chains match a driver-side LWW model at every version, before and after compaction") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 5) {
      val dir = java.nio.file.Files.createTempDirectory(s"snapp$trial").toString
      val nEpochs = 2 + rnd.nextInt(4)
      val keys = 1L to 8L
      // model: per-version replay of (key -> (val, deleted))
      var model = Map.empty[Long, (String, Boolean)]
      val states = scala.collection.mutable.ArrayBuffer[Map[Long, String]]()
      (0 until nEpochs).foreach { v =>
        val rows = keys.filter(_ => rnd.nextBoolean()).map { k =>
          (k, s"v$v-k$k-${rnd.nextInt(100)}", rnd.nextInt(4) == 0)
        }
        // one row per key per epoch (the MERGE contract) — rows is distinct by key
        Snapshots.writeEpoch(rows.toDF("k", "val", "_deleted"), dir, v)
        model = model ++ rows.map(r => r._1 -> (r._2, r._3))
        states += model.collect { case (k, (vv, false)) => k -> vv }.toMap
      }
      def snap(v: Int): Map[Long, String] =
        Snapshots.readAsOf(spark, dir, Seq("k"), v)
          .as[(Long, String)].collect().toMap
      (0 until nEpochs).foreach { v =>
        assert(snap(v) === states(v), s"trial $trial version $v")
      }
      // compact to a random midpoint: every surviving version still matches
      val cut = rnd.nextInt(nEpochs)
      Snapshots.compactTo(spark, dir, Seq("k"), cut)
      (cut until nEpochs).foreach { v =>
        assert(snap(v) === states(v), s"trial $trial post-compact($cut) version $v")
      }
    }
  }

  test("writeEpoch(uniqueOn) rejects a duplicate-key epoch (nondeterministic LWW otherwise)") {
    val dir = java.nio.file.Files.createTempDirectory("snap4").toString
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "val")
    val e = intercept[IllegalArgumentException] {
      Snapshots.writeEpoch(dup, dir, 0, uniqueOn = Seq("k"))
    }
    assert(e.getMessage.contains("one-row-per-key"))
    // unique input passes with the same check on
    Snapshots.writeEpoch(Seq((1L, "a"), (2L, "c")).toDF("k", "val"),
      dir, 0, uniqueOn = Seq("k"))
    assert(Snapshots.readAsOf(spark, dir, Seq("k"), 0).count() === 2)
  }

  test("readAsOf without a delete column is plain LWW") {
    val dir = java.nio.file.Files.createTempDirectory("snap2").toString
    Snapshots.writeEpoch(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"), dir, 0)
    Snapshots.writeEpoch(Seq((2L, 99.0)).toDF("k", "x"), dir, 3)
    assert(Snapshots.readAsOf(spark, dir, Seq("k"), 3).as[(Long, Double)]
      .collect().toMap === Map(1L -> 10.0, 2L -> 99.0))
    assert(Snapshots.readAsOf(spark, dir, Seq("k"), 2).as[(Long, Double)]
      .collect().toMap === Map(1L -> 10.0, 2L -> 20.0))
  }
}
