package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DROP COLUMN evolution: metadata-only commit, projection semantics
  * on old files, the resurrection fence, physical drain via rewrite,
  * and the refusal walls.
  */
class SnapshotDropColSpec extends SparkSpec {
  import spark.implicits._

  private def base3 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    .toDF("k", "name", "cents")

  test("drop is metadata-only; reads project it away; time travel keeps it") {
    val dest = java.nio.file.Files.createTempDirectory("graft-drop").toString
    Snapshot.publishSnapshot(base3, dest, statsCol = Some("k"))
    val l1 = Snapshot.manifestLines(spark, dest, 1)
    val v2 = Snapshot.dropSnapshotColumn(spark, dest, "name")
    assert(v2 == 2)
    // same files, zero data written
    assert(Snapshot.manifestLines(spark, dest, 2) === l1)
    assert(Snapshot.readSnapshot(spark, dest, 2).columns.toSeq ===
      Seq("k", "cents"))
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)))
    // v1 still reads the full schema (time travel below the drop)
    assert(Snapshot.readSnapshot(spark, dest, 1).columns.toSeq ===
      Seq("k", "name", "cents"))
    ()
  }

  test("append/merge after drop work without the column; re-adding the name refuses") {
    val dest = java.nio.file.Files.createTempDirectory("graft-drop2").toString
    Snapshot.publishSnapshot(base3, dest, statsCol = Some("k"))
    Snapshot.dropSnapshotColumn(spark, dest, "name")
    Snapshot.appendSnapshot(Seq((4L, 40L)).toDF("k", "cents"), dest)
    val v4 = Snapshot.mergeSnapshot(Seq((2L, 99L)).toDF("k", "cents"),
      dest, "k")
    assert(rows(Snapshot.readSnapshot(spark, dest, v4).orderBy("k")) ===
      Seq(Seq(1L, 10L), Seq(2L, 99L), Seq(3L, 30L), Seq(4L, 40L)))
    // the fence: re-adding 'name' refuses on every write path
    intercept[IllegalArgumentException] {
      Snapshot.appendSnapshot(
        Seq((5L, "zombie", 50L)).toDF("k", "name", "cents"), dest)
    }
    intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshot(
        Seq((1L, "zombie", 11L)).toDF("k", "name", "cents"), dest, "k")
    }
    intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshotMoR(
        Seq((1L, "zombie", 11L)).toDF("k", "name", "cents"), dest, "k")
    }
    // and the fence survives further commits (header carried)
    intercept[IllegalArgumentException] {
      Snapshot.appendSnapshot(
        Seq((6L, "zombie", 60L)).toDF("k", "name", "cents"), dest)
    }
    ()
  }

  test("rewrites drain the dropped bytes; refusal walls") {
    val dest = java.nio.file.Files.createTempDirectory("graft-drop3").toString
    Snapshot.publishSnapshot(base3.coalesce(1), dest, statsCol = Some("k"))
    Snapshot.dropSnapshotColumn(spark, dest, "name")
    // a merge rewrites the touched file UNDER the reduced schema: the
    // new physical file no longer holds the column at all
    val v3 = Snapshot.mergeSnapshot(Seq((1L, 11L)).toDF("k", "cents"),
      dest, "k")
    val newFiles = Snapshot.manifestLines(spark, dest, v3)
      .map(_.split("\t").head).filter(_.contains("data/v3/"))
    assert(newFiles.nonEmpty)
    val raw = spark.read.parquet(newFiles.map(f => s"$dest/$f"): _*)
    assert(!raw.columns.contains("name"), raw.columns.mkString(","))
    // refusals: stats column, unknown column, tombstoned table
    intercept[IllegalArgumentException] {
      Snapshot.dropSnapshotColumn(spark, dest, "k")
    }
    intercept[IllegalArgumentException] {
      Snapshot.dropSnapshotColumn(spark, dest, "nope")
    }
    Snapshot.mergeSnapshotMoR(Seq((2L, 22L)).toDF("k", "cents"), dest, "k")
    intercept[IllegalArgumentException] {
      Snapshot.dropSnapshotColumn(spark, dest, "cents")
    }
    ()
  }
}
