package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read LOG FOLD (compactSnapshotMoRLog): K accumulated
  * (batch, delete-set) generations collapse into one without touching
  * a single base file — resolved reads unchanged, resolve tax bounded
  * by the LIVE update set, bloom point lookups intact, #rows header
  * preserved through the whole lifecycle. Plus the single-commit
  * upsert+delete applier (applySnapshotMoR) and the
  * index-discarding-statsCol refusal on mergeSnapshot.
  */
class SnapshotMorFoldSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def logSeqs(dir: String, v: Int): (Seq[Long], Seq[Long]) = {
    val lines = Snapshot.manifestLines(spark, dir, v)
    def seqOf(l: String): Long =
      "data/v(\\d+)(_del)?/".r.findFirstMatchIn(l).get.group(1).toLong
    val del = lines.filter(_.startsWith("!")).map(seqOf).distinct
    val ups = lines.filterNot(_.startsWith("!"))
      .filter(l => del.contains(seqOf(l))).map(seqOf).distinct
    (ups, del)
  }

  test("fold collapses K log generations into one; resolved state and #rows unchanged-correct") {
    val d = tmp("graft-fold")
    Snapshot.publishSnapshot(
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v").repartition(2),
      d, statsCol = Some("k"))
    Snapshot.mergeSnapshotMoR(
      Seq((1L, "u1"), (2L, "u2")).toDF("k", "v"), d, "k")        // v2
    Snapshot.deleteSnapshotMoR(Seq(3L).toDF("k"), d, "k")        // v3
    Snapshot.mergeSnapshotMoR(
      Seq((2L, "u2b"), (21L, "n21")).toDF("k", "v"), d, "k")     // v4
    Snapshot.deleteSnapshotMoR(Seq(1L).toDF("k"), d, "k")        // v5
    val before = rows(Snapshot.readSnapshot(spark, d, 5).orderBy("k"))
    assert(before.length == 19) // 20 - {1,3} + {21}
    assert(logSeqs(d, 5)._2.length == 4) // four delete generations
    val v6 = Snapshot.compactSnapshotMoRLog(spark, d)
    assert(v6 == 6)
    // resolved content identical, byte for byte
    assert(rows(Snapshot.readSnapshot(spark, d, 6).orderBy("k")) === before)
    // the log is ONE generation now: one delete-set seq, same seq for
    // the winners batch; base files carried untouched
    val (ups, dels) = logSeqs(d, 6)
    assert(dels.length == 1 && ups == dels, s"ups=$ups dels=$dels")
    val m6 = Snapshot.manifestLines(spark, d, 6)
    assert(m6.exists(_.startsWith("@")) ||
      m6.exists(_.contains("data/v1/")), m6.mkString("\n"))
    // #rows: 20 carried base rows + 2 winners (k2, k21)
    val hist = rows(Snapshot.snapshotHistory(spark, d))
      .map(r => (r(0), r(3))).toMap
    assert(hist(6) == 22L, hist.toString)
    // folding a folded log is a no-op
    assert(Snapshot.compactSnapshotMoRLog(spark, d) == 6)
    // point nothing lost downstream: a later merge and a reconcile both
    // work on the folded lineage
    Snapshot.mergeSnapshotMoR(Seq((4L, "u4")).toDF("k", "v"), d, "k") // v7
    val v8 = Snapshot.reconcileSnapshotMoR(spark, d)
    assert(v8 == 8)
    val want = before.map {
      case Seq(4L, _) => Seq[Any](4L, "u4")
      case r => r
    }
    assert(rows(Snapshot.readSnapshot(spark, d, 8).orderBy("k")) === want)
    ()
  }

  test("fold on a bloom-indexed table: point lookups live, words + #rows carried") {
    val d = tmp("graft-foldx")
    Snapshot.publishSnapshotIndexed(
      (1L to 50L).map(k => (s"k$k", k)).toDF("k", "n").repartition(4),
      d, Nil, "k") // bloom-only: stats-less indexed lines
    Snapshot.mergeSnapshotMoR(
      Seq(("k5", 500L), ("k51", 51L)).toDF("k", "n"), d, "k") // v2
    Snapshot.deleteSnapshotMoR(Seq("k7").toDF("k"), d, "k")   // v3
    Snapshot.mergeSnapshotMoR(Seq(("k5", 555L)).toDF("k", "n"), d, "k") // v4
    val v5 = Snapshot.compactSnapshotMoRLog(spark, d)
    assert(v5 == 5)
    // the #bloom header and the morkey survive the fold
    assert(Snapshot.manifestLines(spark, d, 5).nonEmpty)
    def point(key: String) =
      rows(Snapshot.readSnapshotPoint(spark, d, 5, key))
    assert(point("k5") === Seq(Seq("k5", 555L)))  // upserted twice
    assert(point("k7") === Seq.empty)              // deleted
    assert(point("k9") === Seq(Seq("k9", 9L)))     // untouched base
    assert(point("k999") === Seq.empty)            // never existed
    // bloom-only lines carry their row counts: the #rows header is
    // still exact after the fold (50 base + 2 winners)
    val hist = rows(Snapshot.snapshotHistory(spark, d))
      .map(r => (r(0), r(3))).toMap
    assert(hist(5) == 52L, hist.toString)
    ()
  }

  test("bloom-only lifecycle keeps row counts: reconcile keeps #rows, compaction sizes correctly") {
    val d = tmp("graft-brows")
    Snapshot.publishSnapshotIndexed(
      (1L to 40L).map(k => (s"k$k", k)).toDF("k", "n").repartition(2),
      d, Nil, "k")
    Snapshot.mergeSnapshotMoR(Seq(("k3", 333L)).toDF("k", "n"), d, "k")
    Snapshot.deleteSnapshotMoR(Seq("k4").toDF("k"), d, "k")
    val v4 = Snapshot.reconcileSnapshotMoR(spark, d)
    // before the rows-in-indexed-lines fix, the first reconcile of a
    // bloom-only table dropped the #rows header forever
    val hist = rows(Snapshot.snapshotHistory(spark, d))
      .map(r => (r(0), r(3))).toMap
    assert(hist(v4) == 39L, hist.toString) // 40 keys - deleted k4 = 39 live
    // and compaction no longer misreads every carried file as small:
    // with minRows=1 nothing qualifies, so nothing is rewritten
    assert(Snapshot.compactSnapshot(spark, d, minRows = 1L,
      targetRows = 1000000L) == v4)
    ()
  }

  test("morStream's foldEvery: the streaming producer folds its log in-stream, replay-safe") {
    import graft.streaming.Ingest
    val dest = tmp("graft-foldstream")
    def kv(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")
    Ingest.applyMorBatch(kv(1L -> "a", 2L -> "b"), dest, 0L, "k")
    Ingest.applyMorBatch(kv(2L -> "B", 3L -> "c"), dest, 1L, "k")
    Ingest.applyMorBatch(kv(1L -> "A", 4L -> "d"), dest, 2L, "k",
      foldEvery = 3)
    // batches 1+2's two log generations folded into one at batch 2
    val v = Snapshot.latestVersion(spark, dest)
    assert(Snapshot.versionTag(spark, dest, v).contains("batch=2"))
    assert(logSeqs(dest, v)._2.length == 1)
    assert(rows(Snapshot.readSnapshot(spark, dest, v).orderBy("k")) ===
      Seq(Seq(1L, "A"), Seq(2L, "B"), Seq(3L, "c"), Seq(4L, "d")))
    // crash between batch 2's merge and its fold: the replay skips the
    // merge (tag present) and re-folds — a folded log is a no-op
    Ingest.applyMorBatch(kv(1L -> "A", 4L -> "d"), dest, 2L, "k",
      foldEvery = 3)
    assert(Snapshot.latestVersion(spark, dest) == v)
    assert(rows(Snapshot.readSnapshot(spark, dest, v).orderBy("k")) ===
      Seq(Seq(1L, "A"), Seq(2L, "B"), Seq(3L, "c"), Seq(4L, "d")))
    ()
  }

  test("applySnapshotMoR: upserts and deletes land in ONE commit") {
    val d = tmp("graft-apply")
    Snapshot.publishSnapshot(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), d)
    val v2 = Snapshot.applySnapshotMoR(
      updates = Seq((2L, "B2"), (4L, "d")).toDF("k", "v"),
      deleteKeys = Seq(1L).toDF("k"), d, "k", tag = Some("w1"))
    assert(v2 == 2)
    assert(Snapshot.versionTag(spark, d, 2).contains("w1"))
    assert(rows(Snapshot.readSnapshot(spark, d, 2).orderBy("k")) ===
      Seq(Seq(2L, "B2"), Seq(3L, "c"), Seq(4L, "d")))
    ()
  }

  test("readSnapshotWhere: MoR-transparent predicate read equals filter-on-resolved; no-overlap short-circuits") {
    val d = tmp("graft-where")
    Snapshot.publishSnapshot(
      (1L to 100L).map(k => (k, k * 10)).toDF("k", "bal")
        .repartitionByRange(5, col("k")), d, statsCol = Some("k"))
    Snapshot.mergeSnapshotMoR(
      Seq((10L, -1L), (55L, -2L)).toDF("k", "bal"), d, "k")
    Snapshot.deleteSnapshotMoR(Seq(12L).toDF("k"), d, "k")
    val v = Snapshot.latestVersion(spark, d)
    // pruned predicate read over the LIVE (tombstoned) table — range
    // reads refuse here, this is the lane that serves them
    val got = rows(Snapshot.readSnapshotWhere(spark, d, v,
      col("k") >= 8L && col("k") <= 15L).orderBy("k"))
    val want = rows(Snapshot.readSnapshot(spark, d, v)
      .filter(col("k") >= 8L && col("k") <= 15L).orderBy("k"))
    assert(got === want)
    assert(got.map(_.head) === Seq(8L, 9L, 10L, 11L, 13L, 14L, 15L))
    assert(got.find(_.head == 10L).get(1) == -1L) // upsert resolved
    // an unbounded shape (predicate on a non-stats column) still
    // answers exactly — just without file pruning
    assert(rows(Snapshot.readSnapshotWhere(spark, d, v,
      col("bal") < 0L).orderBy("k")).map(_.head) === Seq(10L, 55L))
    // a range no file can hold returns empty without opening anything
    assert(Snapshot.readSnapshotWhere(spark, d, v,
      col("k") > 5000L).count() == 0)
    ()
  }

  test("mergeSnapshot refuses an index-discarding explicit statsCol; plain merge keeps the index") {
    val d = tmp("graft-msi")
    Snapshot.publishSnapshotIndexed(
      (1L to 10L).map(k => (k, s"v$k")).toDF("k", "v"), d, Seq("k"), "k")
    val e = intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshot(Seq((1L, "x")).toDF("k", "v"), d, "k",
        statsCol = Some("k"))
    }
    assert(e.getMessage.contains("discard the index"))
    // without the override the merge routes through the indexed lane
    val v2 = Snapshot.mergeSnapshot(Seq((1L, "x")).toDF("k", "v"), d, "k")
    assert(v2 == 2)
    assert(rows(Snapshot.readSnapshotPoint(spark, d, 2, "1")) ===
      Seq(Seq(1L, "x")))
    ()
  }
}
