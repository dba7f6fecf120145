package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Change data feed (Snapshot.changeFeed): per-version event
  * attribution over mixed append/merge/delete/update histories, pure
  * deletes vs re-stated keys, schema-evolution null-fill, the
  * rewrite-crossing refusal, and the empty range. */
class SnapshotCdfSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def kv(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  test("events attribute to their commit; deletes are pure; upserts carry postimages") {
    val dest = tmp("graft-cdf")
    Snapshot.publishSnapshot(kv(1L -> "a", 2L -> "b"), dest,
      statsCol = Some("k"))
    Snapshot.appendSnapshot(kv(3L -> "c"), dest)              // v2: insert
    Snapshot.mergeSnapshotMoR(kv(2L -> "B", 4L -> "D"), dest, "k") // v3: upsert
    Snapshot.deleteSnapshotMoR(Seq(1L, 4L).toDF("k"), dest, "k")   // v4: delete
    Snapshot.updateSnapshotMoRWhere(spark, dest, "k",
      col("v") === "c", Map("v" -> lit("C!")))                // v5: upsert
    val feed = Snapshot.changeFeed(spark, dest, 1, 5)
      .collect().map(r => (r.getInt(3), r.getString(2), r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(feed === Set(
      (2, "insert", 3L, "c"),
      (3, "upsert", 2L, "B"), (3, "upsert", 4L, "D"),
      (4, "delete", 1L, null), (4, "delete", 4L, null),
      (5, "upsert", 3L, "C!")))
    // an applier replaying the feed over v1 reproduces v5 exactly
    assert(rows(Snapshot.readSnapshot(spark, dest, 5).orderBy("k")) ===
      Seq(Seq(2L, "B"), Seq(3L, "C!")))
    // sub-ranges slice the same events
    assert(Snapshot.changeFeed(spark, dest, 3, 4).count() == 2)
    assert(Snapshot.changeFeed(spark, dest, 5, 5).count() == 0)
  }

  test("plan pin: a long range stays TWO parquet scans (plus the anti-join's re-read)") {
    val dest = tmp("graft-cdfp")
    Snapshot.publishSnapshot(kv(1L -> "a"), dest, statsCol = Some("k"))
    (0 until 12).foreach { i =>
      if (i % 3 == 2)
        Snapshot.deleteSnapshotMoR(Seq(100L + i).toDF("k"), dest, "k")
      else
        Snapshot.mergeSnapshotMoR(kv((100L + i) -> s"u$i"), dest, "k")
    }
    val feed = Snapshot.changeFeed(spark, dest, 1, 13)
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => 1
      case other => other.children.map(scans).sum +
        other.subqueries.map(scans).sum
    }
    val n = scans(feed.queryExecution.executedPlan)
    // one scan over ALL added data files, one over all delete-sets,
    // and at most one data re-read feeding the pure-delete anti-join —
    // NEVER one relation per version (12 versions here)
    assert(n <= 3, s"expected <=3 file scans for a 12-version feed, got $n")
    assert(feed.count() == 12)
  }

  test("evolved columns null-fill on older events; rewrite crossing refuses") {
    val dest = tmp("graft-cdf2")
    Snapshot.publishSnapshot(kv(1L -> "a").coalesce(1), dest,
      statsCol = Some("k"))
    Snapshot.appendSnapshot(kv(2L -> "b").coalesce(1), dest)
    Snapshot.mergeSnapshotMoR(
      Seq((2L, "B", 9L)).toDF("k", "v", "extra"), dest, "k") // adds a column
    val feed = Snapshot.changeFeed(spark, dest, 1, 3)
      .orderBy("k", "_commit_version")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    // v2's insert event null-fills the evolved column
    assert(feed === Seq((2L, -1L), (2L, 9L)))
    Snapshot.reconcileSnapshotMoR(spark, dest)
    intercept[IllegalArgumentException] {
      Snapshot.changeFeed(spark, dest, 1,
        Snapshot.latestVersion(spark, dest)).count()
    }
    // post-rewrite ranges work again
    Snapshot.appendSnapshot(
      Seq((5L, "e", 1L)).toDF("k", "v", "extra"), dest)
    val post = Snapshot.changeFeed(spark, dest, 4, 5)
    assert(post.count() == 1 &&
      post.head().getString(post.columns.indexOf("_change_type")) == "insert")
  }
}
