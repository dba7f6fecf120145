package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental view maintenance semantics: bootstrap, O(delta) refresh
  * equal to the full recompute, replay idempotence, untouched-view
  * carry-by-reference, and the append-only contract's refusal wall.
  */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def src(rows: (Long, Long)*) = rows.toSeq.toDF("grp", "cents")

  private def full(dir: String, v: Int) =
    rows(Snapshot.readSnapshot(spark, dir, v)
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum("cents").as("total"))
      .orderBy("grp"))

  test("bootstrap + two incremental refreshes equal the full recompute; replay is a no-op") {
    val s = java.nio.file.Files.createTempDirectory("graft-mv-src").toString
    val m = java.nio.file.Files.createTempDirectory("graft-mv").toString
    Snapshot.publishSnapshot(src(1L -> 10L, 1L -> 20L, 2L -> 5L), s)
    val mv1 = MaterializedView.refreshSumView(spark, s, m, "grp", "cents")
    assert(mv1 == 1)
    assert(rows(Snapshot.readSnapshot(spark, m, 1).orderBy("grp")) === full(s, 1))
    // replay with nothing new: same version back, no new commit
    assert(MaterializedView.refreshSumView(spark, s, m, "grp", "cents") == 1)

    Snapshot.appendSnapshot(src(1L -> 100L, 3L -> 7L), s)
    val mv2 = MaterializedView.refreshSumView(spark, s, m, "grp", "cents")
    assert(mv2 == 2)
    assert(rows(Snapshot.readSnapshot(spark, m, 2).orderBy("grp")) ===
      Seq(Seq(1L, 3L, 130L), Seq(2L, 1L, 5L), Seq(3L, 1L, 7L)))
    // two source appends folded by ONE refresh
    Snapshot.appendSnapshot(src(2L -> 1L), s)
    Snapshot.appendSnapshot(src(2L -> 2L, 4L -> 40L), s)
    val mv3 = MaterializedView.refreshSumView(spark, s, m, "grp", "cents")
    assert(rows(Snapshot.readSnapshot(spark, m, mv3).orderBy("grp")) ===
      full(s, Snapshot.latestVersion(spark, s)))
    // crash-replay: a re-run against the already-applied source version
    // sees its own tag and returns without committing
    assert(MaterializedView.refreshSumView(spark, s, m, "grp", "cents") == mv3)
    assert(Snapshot.latestVersion(spark, m) == mv3)
    ()
  }

  test("refresh touches only view files holding a touched key (carry by reference)") {
    val s = java.nio.file.Files.createTempDirectory("graft-mv-src2").toString
    val m = java.nio.file.Files.createTempDirectory("graft-mv2").toString
    // 100 groups spread over 8 view files (bootstrap shapes the view)
    Snapshot.publishSnapshot(
      spark.range(1000L).select((col("id") % 100L).as("grp"),
        col("id").as("cents")), s)
    MaterializedView.refreshSumView(spark, s, m, "grp", "cents",
      viewFiles = 8)
    // delta touches ONE group → the merge under the view rewrites only
    // the file(s) holding it; the rest of the bootstrap's files carry
    Snapshot.appendSnapshot(src(7L -> 1000000L), s)
    val mv2 = MaterializedView.refreshSumView(spark, s, m, "grp", "cents")
    val l2 = Snapshot.manifestLines(spark, m, mv2)
    assert(l2.exists(_.contains("data/v1/")),
      s"expected carried bootstrap files:\n${l2.mkString("\n")}")
    assert(rows(Snapshot.readSnapshot(spark, m, mv2)
      .filter(col("grp") === 7L)) === Seq(Seq(7L, 11L, 1004570L)))
    ()
  }

  test("a compacted source refuses refresh (append-only CDC contract)") {
    val s = java.nio.file.Files.createTempDirectory("graft-mv-src3").toString
    val m = java.nio.file.Files.createTempDirectory("graft-mv3").toString
    Snapshot.publishSnapshot(src(1L -> 1L).coalesce(1), s,
      statsCol = Some("grp"))
    MaterializedView.refreshSumView(spark, s, m, "grp", "cents")
    Snapshot.appendSnapshot(src(1L -> 2L).coalesce(1), s)
    Snapshot.appendSnapshot(src(2L -> 3L).coalesce(1), s)
    Snapshot.compactSnapshot(spark, s, minRows = 10L, targetRows = 100L)
    intercept[IllegalArgumentException] {
      MaterializedView.refreshSumView(spark, s, m, "grp", "cents")
    }
    ()
  }
}
