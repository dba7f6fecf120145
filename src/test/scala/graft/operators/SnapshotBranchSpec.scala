package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Branch refs + write-audit-publish (Snapshot.createBranch /
  * readSnapshotBranch / advanceBranch): branch readers isolated from
  * unpublished commits, atomic publish flip with an optimistic guard,
  * rollback, and branch-aware vacuum (a pin is never reclaimed).
  */
class SnapshotBranchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def kv(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  test("write-audit-publish: unpublished commits invisible to branch readers") {
    val dest = tmp("graft-br")
    Snapshot.publishSnapshot(kv(1L -> "a"), dest)
    Snapshot.createBranch(spark, dest, "main", 1)
    // producer commits v2 and v3 — the branch still serves v1
    Snapshot.appendSnapshot(kv(2L -> "b"), dest)
    Snapshot.appendSnapshot(kv(3L -> "c"), dest)
    assert(Snapshot.readSnapshotBranch(spark, dest, "main").count() == 1)
    // audit the candidate DIRECTLY (not through the branch), then flip
    assert(Snapshot.readSnapshot(spark, dest, 3).count() == 3)
    Snapshot.advanceBranch(spark, dest, "main", 3, expectedFrom = Some(1))
    assert(rows(Snapshot.readSnapshotBranch(spark, dest, "main")
      .orderBy("k")).map(_.head) === Seq(1L, 2L, 3L))
    // optimistic guard: a stale expectedFrom refuses
    intercept[Snapshot.ConcurrentSnapshotUpdate] {
      Snapshot.advanceBranch(spark, dest, "main", 2, expectedFrom = Some(1))
    }
    // rollback on purpose (no guard) is allowed
    Snapshot.advanceBranch(spark, dest, "main", 2)
    assert(Snapshot.readSnapshotBranch(spark, dest, "main").count() == 2)
    // duplicate create refuses; bad names refuse
    intercept[IllegalStateException] {
      Snapshot.createBranch(spark, dest, "main", 1)
    }
    intercept[IllegalArgumentException] {
      Snapshot.createBranch(spark, dest, "no/slash", 1)
    }
  }

  test("vacuum never reclaims a branch-pinned version; dropBranch releases it") {
    val dest = tmp("graft-brv")
    Snapshot.publishSnapshot(kv(1L -> "a"), dest)
    Snapshot.appendSnapshot(kv(2L -> "b"), dest)
    Snapshot.createBranch(spark, dest, "audit", 2)
    Snapshot.appendSnapshot(kv(3L -> "c"), dest)
    Snapshot.appendSnapshot(kv(4L -> "d"), dest)
    // vacuum to keepFrom=4: v1 and v3 go, the PINNED v2 survives whole
    Snapshot.vacuum(spark, dest, keepFrom = 4)
    assert(rows(Snapshot.readSnapshotBranch(spark, dest, "audit")
      .orderBy("k")).map(_.head) === Seq(1L, 2L))
    intercept[Exception] { Snapshot.readSnapshot(spark, dest, 3).count() }
    assert(Snapshot.readSnapshot(spark, dest, 4).count() == 4)
    // releasing the pin makes the version ordinary retention again
    Snapshot.dropBranch(spark, dest, "audit")
    Snapshot.vacuum(spark, dest, keepFrom = 4)
    intercept[Exception] {
      Snapshot.readSnapshot(spark, dest, 2).count()
    }
    // and the latest still reads fine (shared files kept by reference)
    assert(Snapshot.readSnapshot(spark, dest, 4).count() == 4)
  }
}
