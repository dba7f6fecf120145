package graft.streaming

import graft.SparkSpec
import graft.operators.Snapshot
import org.apache.spark.sql.functions._

/** snapshotStream's contract beyond the gate row: version-per-batch
  * commits are exactly-once under replay (the batch tag rides the
  * manifest whose rename is the commit point), and a later run with
  * the same checkpoint appends ONLY newly arrived batch files — so a
  * continuously-fed snapshot table accumulates one version per batch
  * with no duplicates and no rewrites.
  */
class SnapshotStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, name: String, mtime: Long,
                         rows: Seq[(Long, String)]): Unit = {
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val stage = s"$dir/.stage_$name"
    rows.toDF("id", "v").coalesce(1).write.parquet(stage)
    val parts = JF.list(Paths.get(stage)).iterator()
    val src = Iterator.continually(parts).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.startsWith("part-")).get
    JF.move(src, Paths.get(s"$dir/$name"), StandardCopyOption.ATOMIC_MOVE)
    JF.setLastModifiedTime(Paths.get(s"$dir/$name"),
      FileTime.fromMillis(mtime))
    ()
  }

  test("one version per batch; incremental catch-up appends, never rewrites") {
    val src = java.nio.file.Files.createTempDirectory("graft-sns").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sno").toString
    writeBatch(src, "b0.parquet", 1000L, Seq((1L, "a"), (2L, "b")))
    writeBatch(src, "b1.parquet", 2000L, Seq((3L, "c")))
    Ingest.snapshotStream(spark, src, "b*.parquet",
      s"$out/dest", s"$out/chk")
    assert(Snapshot.latestVersion(spark, s"$out/dest") == 2)
    assert(Snapshot.versionTag(spark, s"$out/dest", 1) == Some("batch=0"))
    assert(Snapshot.versionTag(spark, s"$out/dest", 2) == Some("batch=1"))
    assert(rows(Snapshot.readSnapshot(spark, s"$out/dest", 1).orderBy("id"))
      === Seq(Seq(1L, "a"), Seq(2L, "b")))

    // catch-up with the SAME checkpoint: only the new file lands
    writeBatch(src, "b2.parquet", 3000L, Seq((4L, "d")))
    Ingest.snapshotStream(spark, src, "b*.parquet",
      s"$out/dest", s"$out/chk")
    assert(Snapshot.latestVersion(spark, s"$out/dest") == 3)
    assert(rows(Snapshot.readSnapshot(spark, s"$out/dest", 3).orderBy("id"))
      === Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c"), Seq(4L, "d")))
    // the append referenced old files rather than rewriting them
    val m3 = graft.operators.Snapshot.manifestLines(spark, s"$out/dest", 3)
      .mkString("\n")
    assert(m3.contains("data/v1/") && m3.contains("data/v2/") &&
      m3.contains("data/v3/"), m3)
  }

  test("inline auto-compaction stays exactly-once: compaction rides the tag") {
    val dest = java.nio.file.Files.createTempDirectory("graft-snc").toString
    def apply(id: Long, rows: Seq[(Long, String)]) =
      Ingest.applySnapshotBatch(rows.toDF("id", "v").coalesce(1), dest, id,
        statsCol = Some("id"), compactEvery = 2,
        compactMinRows = 100L, compactTargetRows = 1000L)
    apply(0L, Seq((1L, "a")))        // v1 (publish)
    apply(1L, Seq((2L, "b")))        // v2 (append) + v3 (compaction)
    assert(Snapshot.latestVersion(spark, dest) == 3)
    assert(Snapshot.versionTag(spark, dest, 2).contains("batch=1"))
    assert(Snapshot.versionTag(spark, dest, 3).contains("batch=1"))
    // the compacted version packed both tiny files into one
    val m3 = graft.operators.Snapshot.manifestLines(spark, dest, 3)
    assert(m3.size == 1, m3.mkString("\n"))
    // replay of batch 1 after the compaction commit: still a no-op
    apply(1L, Seq((2L, "b")))
    assert(Snapshot.latestVersion(spark, dest) == 3)
    assert(rows(Snapshot.readSnapshot(spark, dest, 3).orderBy("id"))
      === Seq(Seq(1L, "a"), Seq(2L, "b")))
    // next batch appends onto the compacted lineage
    apply(2L, Seq((3L, "c")))        // v4
    assert(rows(Snapshot.readSnapshot(spark, dest, 4).orderBy("id"))
      === Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
  }

  test("replayed batch is a no-op: the manifest tag is the commit record") {
    val dest = java.nio.file.Files.createTempDirectory("graft-snr").toString
    val b0 = Seq((1L, "a")).toDF("id", "v")
    val b1 = Seq((2L, "b")).toDF("id", "v")
    Ingest.applySnapshotBatch(b0, dest, 0L)
    Ingest.applySnapshotBatch(b1, dest, 1L)
    assert(Snapshot.latestVersion(spark, dest) == 2)
    // crash-after-commit replay: the SAME batchId re-applies — skipped
    Ingest.applySnapshotBatch(b1, dest, 1L)
    assert(Snapshot.latestVersion(spark, dest) == 2)
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("id"))
      === Seq(Seq(1L, "a"), Seq(2L, "b")))
    // a crash BEFORE the manifest rename left only orphans: simulate by
    // re-applying a NEW batch whose first attempt never committed — the
    // version number is re-derived from the committed manifests only
    Ingest.applySnapshotBatch(Seq((3L, "c")).toDF("id", "v"), dest, 2L)
    assert(Snapshot.latestVersion(spark, dest) == 3)
    assert(Snapshot.readSnapshot(spark, dest, 3).count() == 3)
  }

  test("replay across maintenance commits: a buried batch tag still skips (no double-apply)") {
    // The r15 watermark fix, table edition: an operator compacts /
    // Z-orders the stopped stream's table between a crashed batch
    // commit and the restart — the untagged maintenance version buries
    // the batch tag, and the old head-only probe would re-apply the
    // batch.
    val dest = java.nio.file.Files.createTempDirectory("graft-snm").toString
    Ingest.applySnapshotBatch(
      (1L to 6L).map(i => (i, s"r$i")).toDF("id", "v").coalesce(3),
      dest, 0L)
    Ingest.applySnapshotBatch(Seq((7L, "b")).toDF("id", "v"), dest, 1L)
    // maintenance between the crash and the restart (untagged)
    Snapshot.compactSnapshot(spark, dest, minRows = 1000000L,
      targetRows = 1000000L)
    assert(Snapshot.versionTag(spark, dest,
      Snapshot.latestVersion(spark, dest)).isEmpty)
    // the restarted stream replays batch 1 across the buried tag
    Ingest.applySnapshotBatch(Seq((7L, "b")).toDF("id", "v"), dest, 1L)
    assert(Snapshot.readSnapshot(spark, dest,
      Snapshot.latestVersion(spark, dest)).count() == 7) // not 8
    // and the MoR applier shares the watermark
    val mor = java.nio.file.Files.createTempDirectory("graft-snm2").toString
    Ingest.applyMorBatch(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      mor, 0L, "k")
    Ingest.applyMorBatch(Seq((2L, "B")).toDF("k", "v"), mor, 1L, "k")
    Snapshot.reconcileSnapshotMoR(spark, mor) // untagged maintenance
    Ingest.applyMorBatch(Seq((2L, "B")).toDF("k", "v"), mor, 1L, "k")
    // exactly-once by idempotence would hide a re-merge; version count
    // is the honest witness (a re-applied merge would mint a version)
    assert(Snapshot.latestVersion(spark, mor) == 3)
    assert(rows(Snapshot.readSnapshot(spark, mor, 3).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "B")))
    ()
  }

  test("vacuum across the tag carrier: the batch watermark keeps replay exactly-once") {
    // The r15 What's-missing #1: Snapshot.vacuum prunes the manifest
    // carrying a crashed stream's last batch= tag; the downward scan
    // hits the gap and — pre-watermark — read it as "never committed",
    // double-applying the batch. vacuum now records the pruned-batch
    // watermark BEFORE deleting any manifest, so the replay skips.
    val dest = java.nio.file.Files.createTempDirectory("graft-snv").toString
    Ingest.applySnapshotBatch(Seq((1L, "a")).toDF("id", "v"), dest, 0L) // v1
    Ingest.applySnapshotBatch(Seq((2L, "b")).toDF("id", "v"), dest, 1L) // v2
    // untagged maintenance buries the tag, then vacuum prunes BOTH
    // tagged versions (keepFrom = head) — the crash window's worst case
    Snapshot.compactSnapshot(spark, dest, 1000000L, 1000000L)           // v3
    val head = Snapshot.latestVersion(spark, dest)
    Snapshot.vacuum(spark, dest, keepFrom = head)
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(Snapshot.batchWatermark(fs, dest).contains(1L))
    // the restarted stream replays batch 1 across the vacuumed gap
    Ingest.applySnapshotBatch(Seq((2L, "b")).toDF("id", "v"), dest, 1L)
    assert(Snapshot.latestVersion(spark, dest) == head) // skipped
    assert(rows(Snapshot.readSnapshot(spark, dest, head).orderBy("id"))
      === Seq(Seq(1L, "a"), Seq(2L, "b")))
    // and the NEXT batch still lands normally
    Ingest.applySnapshotBatch(Seq((3L, "c")).toDF("id", "v"), dest, 2L)
    assert(Snapshot.readSnapshot(spark, dest,
      Snapshot.latestVersion(spark, dest)).count() == 3)
  }

  test("a pre-watermark gap REFUSES loudly instead of double-applying") {
    val dest = java.nio.file.Files.createTempDirectory("graft-snu").toString
    Ingest.applySnapshotBatch(Seq((1L, "a")).toDF("id", "v"), dest, 0L) // v1
    Ingest.applySnapshotBatch(Seq((2L, "b")).toDF("id", "v"), dest, 1L) // v2
    Snapshot.compactSnapshot(spark, dest, 1000000L, 1000000L)           // v3
    // hand-prune the tag carriers (a legacy vacuum: no watermark file)
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$dest/manifest/v1.txt"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dest/manifest/v2.txt"), false)
    val e = intercept[IllegalStateException] {
      Ingest.applySnapshotBatch(Seq((2L, "b")).toDF("id", "v"), dest, 1L)
    }
    assert(e.getMessage.contains("undecidable"), e.getMessage)
    // a watermark-aware vacuum AFTER the damage still refuses to mint
    // a floor over unknown history: vacuuming the remaining region
    // must not convert the gap into a silent "nothing pruned"
    Snapshot.vacuum(spark, dest, keepFrom = 3)
    assert(Snapshot.batchWatermark(fs, dest).isEmpty)
  }

  test("vacuum with nothing batch-tagged records -1: never-streamed tables stay decidable") {
    val dest = java.nio.file.Files.createTempDirectory("graft-snw").toString
    Snapshot.publishSnapshot(Seq((1L, "a")).toDF("id", "v"), dest)
    Snapshot.appendSnapshot(Seq((2L, "b")).toDF("id", "v"), dest)
    Snapshot.appendSnapshot(Seq((3L, "c")).toDF("id", "v"), dest)
    Snapshot.vacuum(spark, dest, keepFrom = 3)
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(Snapshot.batchWatermark(fs, dest).contains(-1L))
    // starting a stream on the vacuumed batch-writer table: batch 0
    // applies (the -1 watermark answers "nothing pruned was a batch")
    Ingest.applySnapshotBatch(Seq((4L, "d")).toDF("id", "v"), dest, 0L)
    assert(Snapshot.readSnapshot(spark, dest,
      Snapshot.latestVersion(spark, dest)).count() == 4)
  }

  test("randomized soak: crashes, maintenance and vacuums in every order stay exactly-once (table guard)") {
    // The TABLE replay guard's state space drawn at random (the txn
    // soak's twin): each batch may replay (crash after the manifest
    // rename, before the checkpoint advanced), untagged maintenance
    // compacts anywhere — burying the tag — and vacuum prunes below
    // the head at random depths, including straight across the tag
    // carrier (the r16 watermark path). The invariant: every batch's
    // row lands EXACTLY once, whatever order the events land in.
    val rnd = new scala.util.Random(20260816L)
    val dest = java.nio.file.Files.createTempDirectory("graft-snsoak").toString
    val n = 24
    (0 until n).foreach { i =>
      val df = Seq((i.toLong, s"r$i")).toDF("id", "v")
      Ingest.applySnapshotBatch(df, dest, i.toLong)
      // events between the commit and the next batch, in random order
      (0 until rnd.nextInt(3)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => // untagged maintenance buries the tag
            Snapshot.compactSnapshot(spark, dest, 2L, 1000000L); ()
          case 1 => // vacuum at a random depth (maybe across the carrier)
            val latest = Snapshot.latestVersion(spark, dest)
            Snapshot.vacuum(spark, dest,
              keepFrom = 1 + rnd.nextInt(latest)); ()
          case 2 => // crash-replay of THIS batch (only the latest can
            // ever replay — the checkpoint serializes batches)
            Ingest.applySnapshotBatch(df, dest, i.toLong); ()
        }
      }
    }
    val got = rows(Snapshot.readSnapshot(spark, dest,
      Snapshot.latestVersion(spark, dest)).orderBy("id"))
    assert(got === (0 until n).map(i => Seq(i.toLong, s"r$i")),
      s"expected each batch exactly once, got ${got.size} rows")
    ()
  }

  test("concurrent vacuums never regress the batch watermark") {
    // vacuum is ONE critical section per table (the r15 vacuumTxnLog
    // rule): without it, two racers' watermark read-modify-writes tear
    // and the staler writer can REGRESS manifest/batchwm.txt — re-
    // opening the double-apply hole. Four racing vacuums at shuffled
    // depths must leave the max pruned batch id, whatever the order.
    val dest = java.nio.file.Files.createTempDirectory("graft-sncv").toString
    (0 until 6).foreach(i => Ingest.applySnapshotBatch(
      Seq((i.toLong, s"r$i")).toDF("id", "v"), dest, i.toLong))
    import java.util.concurrent.{Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(4)
    Seq(2, 5, 3, 6).foreach(k => pool.submit(new Runnable {
      def run(): Unit = { Snapshot.vacuum(spark, dest, k); () }
    }))
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(
      spark.sessionState.newHadoopConf())
    // deepest vacuum pruned v1..v5 = batches 0..4; wm must read 4
    assert(Snapshot.batchWatermark(fs, dest).contains(4L))
    // replays of a pruned batch AND the head batch both skip
    val head = Snapshot.latestVersion(spark, dest)
    Ingest.applySnapshotBatch(Seq((4L, "r4")).toDF("id", "v"), dest, 4L)
    Ingest.applySnapshotBatch(Seq((5L, "r5")).toDF("id", "v"), dest, 5L)
    assert(Snapshot.latestVersion(spark, dest) == head)
    assert(Snapshot.readSnapshot(spark, dest, head).count() == 6)
  }

  test("non-numeric batch= tags refuse loudly at the guard and at vacuum") {
    val dest = java.nio.file.Files.createTempDirectory("graft-snt").toString
    Snapshot.publishSnapshot(Seq((1L, "a")).toDF("id", "v"), dest,
      tag = Some("batch=oops"))
    val e = intercept[IllegalArgumentException] {
      Ingest.applySnapshotBatch(Seq((2L, "b")).toDF("id", "v"), dest, 0L)
    }
    assert(e.getMessage.contains("malformed batch tag"), e.getMessage)
    Snapshot.appendSnapshot(Seq((2L, "b")).toDF("id", "v"), dest)
    val e2 = intercept[IllegalArgumentException] {
      Snapshot.vacuum(spark, dest, keepFrom = 2)
    }
    assert(e2.getMessage.contains("malformed batch tag"), e2.getMessage)
  }

  test("checkpoint reset against an existing destination: pre-watermark batches skip silently (the documented footgun)") {
    // Pins Ingest.snapshotStream's CHECKPOINT-RESET SEMANTICS doc: a
    // fresh checkpoint restarts Spark's batch ids at 0, and the replay
    // guard reads every id at or below the destination's batch-tag
    // watermark as already-committed (Delta's idempotent-writer
    // behavior). Correct for a recovered feed; a silent drop for a NEW
    // feed pointed at a recycled destDir — which is why the doc says a
    // new feed gets a new destDir.
    val dest = java.nio.file.Files.createTempDirectory("graft-ckr").toString
    Ingest.applySnapshotBatch(Seq((1L, "a")).toDF("id", "v"), dest, 0L)
    Ingest.applySnapshotBatch(Seq((2L, "b")).toDF("id", "v"), dest, 1L)
    assert(Snapshot.latestVersion(spark, dest) == 2)
    // "new source, recycled destination": ids restart at 0 with
    // DIFFERENT data — both pre-watermark batches skip, nothing lands
    Ingest.applySnapshotBatch(Seq((9L, "x")).toDF("id", "v"), dest, 0L)
    Ingest.applySnapshotBatch(Seq((8L, "y")).toDF("id", "v"), dest, 1L)
    assert(Snapshot.latestVersion(spark, dest) == 2)
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("id"))
      === Seq(Seq(1L, "a"), Seq(2L, "b")))
    // the first id ABOVE the watermark lands normally
    Ingest.applySnapshotBatch(Seq((3L, "c")).toDF("id", "v"), dest, 2L)
    assert(Snapshot.latestVersion(spark, dest) == 3)
    assert(Snapshot.readSnapshot(spark, dest, 3).count() == 3)
  }
}
