package graft.streaming

import graft.SparkSpec
import graft.operators.{Snapshot, SnapshotTxn}
import org.apache.spark.sql.functions._

/** Streaming multi-table transactions (Ingest.txnStream): every
  * micro-batch lands across N tables at ONE commit point or not at
  * all, with the batch tag riding the txn manifest for exactly-once
  * under replay — kill-injection at both crash points (before the
  * commit point, and between it and finalization).
  */
class TxnStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

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

  /** The registration unit: each batch upserts samples (MoR after the
    * bootstrap) AND appends datasets — atomically. */
  private def regStage(samplesDir: String, datasetsDir: String)
      : (SnapshotTxn, org.apache.spark.sql.DataFrame, Long) => Unit =
    (t, b, _) => {
      val spark0 = b.sparkSession
      val samples = b.select(col("id").as("k"), col("v"))
      val datasets = b.select((col("id") * 100).as("did"), col("id").as("k"))
      if (Snapshot.latestVersion(spark0, samplesDir) == 0)
        t.stagePublish(samples, samplesDir)
      else t.stageMerge(samples, samplesDir, "k")
      if (Snapshot.latestVersion(spark0, datasetsDir) == 0)
        t.stagePublish(datasets, datasetsDir)
      else t.stageAppend(datasets, datasetsDir)
    }

  test("end-to-end stream: one txn per batch, tagged; both tables move together") {
    val src = tmp("graft-txs-src"); val out = tmp("graft-txs-out")
    val (root, sDir, dDir) = (s"$out/root", s"$out/s", s"$out/d")
    writeBatch(src, "b0.parquet", 1000L, Seq((1L, "a"), (2L, "b")))
    writeBatch(src, "b1.parquet", 2000L, Seq((2L, "B2"), (3L, "c")))
    Ingest.txnStream(spark, src, "b*.parquet", root, s"$out/chk",
      regStage(sDir, dDir))
    assert(SnapshotTxn.latestTxn(spark, root) == 2)
    assert(Snapshot.versionTag(spark, root, 1).contains("batch=0"))
    assert(Snapshot.versionTag(spark, root, 2).contains("batch=1"))
    // samples: last-wins by key; datasets: all rows appended
    assert(rows(SnapshotTxn.readLatest(spark, root, sDir).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "B2"), Seq(3L, "c")))
    assert(rows(SnapshotTxn.readLatest(spark, root, dDir)
      .orderBy("did")).map(_.head) === Seq(100L, 200L, 200L, 300L))
    // catch-up run with the same checkpoint: only the new file lands
    writeBatch(src, "b2.parquet", 3000L, Seq((4L, "d")))
    Ingest.txnStream(spark, src, "b*.parquet", root, s"$out/chk",
      regStage(sDir, dDir))
    assert(SnapshotTxn.latestTxn(spark, root) == 3)
    assert(SnapshotTxn.readLatest(spark, root, sDir).count() == 4)
    ()
  }

  test("crash AFTER the commit point: the replayed batch is recovery-only, never a double-commit") {
    val out = tmp("graft-txs2")
    val (root, sDir, dDir) = (s"$out/root", s"$out/s", s"$out/d")
    val stage = regStage(sDir, dDir)
    def batch(id: Long, rows0: Seq[(Long, String)], crash: Boolean = false) =
      Ingest.applyTxnBatch(spark, root, rows0.toDF("id", "v"), id,
        crashAfterCommitPoint = crash)(stage)
    batch(0L, Seq((1L, "a")))
    batch(1L, Seq((2L, "b")), crash = true) // dies before finalizing
    // the txn committed (atomically) but no table version landed yet
    assert(SnapshotTxn.latestTxn(spark, root) == 2)
    assert(Snapshot.latestVersion(spark, sDir) == 1)
    // REPLAY of batch 1 (checkpoint never advanced): tag-guarded, runs
    // recovery, commits nothing new
    batch(1L, Seq((2L, "b")))
    assert(SnapshotTxn.latestTxn(spark, root) == 2)
    assert(rows(Snapshot.readSnapshot(spark, sDir, 2).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    assert(Snapshot.latestVersion(spark, dDir) == 2)
    // next batch proceeds normally on the recovered bases
    batch(2L, Seq((1L, "A1")))
    assert(rows(SnapshotTxn.readLatest(spark, root, sDir).orderBy("k")) ===
      Seq(Seq(1L, "A1"), Seq(2L, "b")))
    ()
  }

  test("interleaved batch-writer commit between a crashed stream commit and its replay: still exactly-once") {
    // The r14 hole: the replay guard probed only the HEAD txn's tag, so
    // a sanctioned batch writer committing between a crashed micro-batch's
    // commit point and the stream's restart buried the `batch=` tag and
    // the replay double-applied the batch. The guard now scans down to
    // the last batch tag wherever it sits.
    val out = tmp("graft-txs4")
    val (root, sDir, dDir) = (s"$out/root", s"$out/s", s"$out/d")
    val stage = regStage(sDir, dDir)
    def batch(id: Long, rows0: Seq[(Long, String)], crash: Boolean = false) =
      Ingest.applyTxnBatch(spark, root, rows0.toDF("id", "v"), id,
        crashAfterCommitPoint = crash)(stage)
    batch(0L, Seq((1L, "a")))
    batch(1L, Seq((2L, "b")), crash = true) // txn 2 committed, unfinalized
    // a foreign writer (the contract's sanctioned batch path) commits
    // txn 3 on the same log — the batch tag is no longer the head
    SnapshotTxn.recover(spark, root) // writers recover before staging
    val t = SnapshotTxn.begin(spark, root)
    t.stageAppend(Seq((900L, 9L)).toDF("did", "k"), dDir)
    t.commit(tag = Some("maintenance"))
    assert(SnapshotTxn.latestTxn(spark, root) == 3)
    // REPLAY of batch 1 under the buried tag: must commit NOTHING new
    batch(1L, Seq((2L, "b")))
    assert(SnapshotTxn.latestTxn(spark, root) == 3)
    // the stageAppend table holds each batch's rows exactly once
    assert(rows(SnapshotTxn.readLatest(spark, root, dDir).orderBy("did"))
      .map(_.head) === Seq(100L, 200L, 900L))
    assert(rows(SnapshotTxn.readLatest(spark, root, sDir).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    // an untagged foreign txn between batches doesn't hide the watermark
    batch(2L, Seq((3L, "c")))
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageAppend(Seq((901L, 9L)).toDF("did", "k"), dDir)
    t2.commit()
    batch(2L, Seq((3L, "c"))) // replay across an UNTAGGED foreign head
    assert(SnapshotTxn.readLatest(spark, root, dDir)
      .filter(col("did") === 300L).count() == 1)
    ()
  }

  test("replay watermark survives vacuum: the pruned batch tag is decidable from the fold snapshot") {
    val out = tmp("graft-txs5")
    val (root, sDir, dDir) = (s"$out/root", s"$out/s", s"$out/d")
    val stage = regStage(sDir, dDir)
    def batch(id: Long, rows0: Seq[(Long, String)], crash: Boolean = false) =
      Ingest.applyTxnBatch(spark, root, rows0.toDF("id", "v"), id,
        crashAfterCommitPoint = crash)(stage)
    batch(0L, Seq((1L, "a")))
    batch(1L, Seq((2L, "b")))
    // two foreign txns bury the batch tag, then vacuum prunes everything
    // below the head — INCLUDING txn 2, the batch tag's carrier
    (0 until 2).foreach { i =>
      val t = SnapshotTxn.begin(spark, root)
      t.stageAppend(Seq((900L + i, 9L)).toDF("did", "k"), dDir)
      t.commit()
    }
    assert(SnapshotTxn.vacuumTxnLog(spark, root, keepFrom = 4) == 3)
    assert(SnapshotTxn.lastTagged(spark, root, "batch=")
      .contains("batch=1"))
    // the replay of batch 1 over the pruned log is still a no-op
    batch(1L, Seq((2L, "b")))
    assert(SnapshotTxn.readLatest(spark, root, dDir)
      .filter(col("did") === 200L).count() == 1)
    // and the next fresh batch proceeds
    batch(2L, Seq((3L, "c")))
    assert(SnapshotTxn.lastTagged(spark, root, "batch=")
      .contains("batch=2"))
    ()
  }

  test("randomized soak: crashes, foreign commits and vacuums in every order stay exactly-once") {
    // The replay guard's whole state space drawn at random: each batch
    // may crash before or after its commit point, foreign txns (tagged
    // and untagged) land anywhere — including inside the crash window —
    // and the log is pruned mid-stream. The invariant is the only one
    // that matters: every batch's row and every foreign row lands in
    // the stageAppend table EXACTLY once.
    val rnd = new scala.util.Random(20260816L)
    val out = tmp("graft-txsoak")
    val (root, dDir) = (s"$out/root", s"$out/d")
    def stage: (SnapshotTxn, org.apache.spark.sql.DataFrame, Long) => Unit =
      (t, b, _) => {
        if (Snapshot.latestVersion(b.sparkSession, dDir) == 0)
          t.stagePublish(b, dDir)
        else t.stageAppend(b, dDir)
      }
    def batch(id: Long, crash: Int): Unit = {
      val df = Seq((id, s"batch$id")).toDF("id", "v")
      crash match {
        case 0 => Ingest.applyTxnBatch(spark, root, df, id)(stage)
        case 1 => // dies after the commit point, then replays
          Ingest.applyTxnBatch(spark, root, df, id,
            crashAfterCommitPoint = true)(stage)
        case 2 => // dies before the commit point, then replays
          intercept[RuntimeException] {
            Ingest.applyTxnBatch(spark, root, df, id) { (t, b, i) =>
              stage(t, b, i); throw new RuntimeException("injected")
            }
          }; ()
      }
    }
    var foreignN = 0
    def foreign(): Unit = {
      SnapshotTxn.recover(spark, root)
      if (Snapshot.latestVersion(spark, dDir) >= 1) {
        foreignN += 1
        val t = SnapshotTxn.begin(spark, root)
        t.stageAppend(Seq((100000L + foreignN, "foreign"))
          .toDF("id", "v"), dDir)
        t.commit(tag = if (rnd.nextBoolean()) Some("maint=1") else None)
        ()
      }
    }
    val nBatches = 24
    (0 until nBatches).foreach { i =>
      val crash = rnd.nextInt(3)
      batch(i.toLong, crash)
      // foreign commits may land inside the crash window…
      if (rnd.nextInt(3) == 0) foreign()
      // …and the log may be pruned before the replay
      if (rnd.nextInt(4) == 0 && SnapshotTxn.latestTxn(spark, root) >= 1) {
        SnapshotTxn.vacuumTxnLog(spark, root,
          keepFrom = SnapshotTxn.latestTxn(spark, root))
        ()
      }
      if (crash != 0) batch(i.toLong, 0) // the checkpoint replays it
      if (rnd.nextInt(4) == 0) foreign()
    }
    val got = rows(SnapshotTxn.readLatest(spark, root, dDir).orderBy("id"))
      .map(_.head.asInstanceOf[Long])
    val want = (0L until nBatches.toLong) ++
      (1 to foreignN).map(i => 100000L + i)
    assert(got === want.sorted, "every row exactly once")
    ()
  }

  test("crash BEFORE the commit point: nothing visible anywhere; the replay commits fresh") {
    val out = tmp("graft-txs3")
    val (root, sDir, dDir) = (s"$out/root", s"$out/s", s"$out/d")
    val stage = regStage(sDir, dDir)
    Ingest.applyTxnBatch(spark, root, Seq((1L, "a")).toDF("id", "v"), 0L)(stage)
    // batch 1 stages both tables, then the driver "dies" mid-batch
    intercept[RuntimeException] {
      Ingest.applyTxnBatch(spark, root,
        Seq((2L, "b")).toDF("id", "v"), 1L) { (t, b, id) =>
        stage(t, b, id)
        throw new RuntimeException("injected crash before commit point")
      }
    }
    // invisible everywhere: no txn, no versions, only orphans
    assert(SnapshotTxn.latestTxn(spark, root) == 1)
    assert(Snapshot.latestVersion(spark, sDir) == 1)
    assert(Snapshot.vacuumOrphans(spark, sDir, olderThanMs = -1000L) >= 1)
    // the replay stages fresh and commits
    Ingest.applyTxnBatch(spark, root, Seq((2L, "b")).toDF("id", "v"), 1L)(stage)
    assert(SnapshotTxn.latestTxn(spark, root) == 2)
    assert(rows(SnapshotTxn.readLatest(spark, root, sDir).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    // an empty batch stages nothing and commits nothing
    Ingest.applyTxnBatch(spark, root,
      Seq.empty[(Long, String)].toDF("id", "v"), 2L) { (t, b, id) =>
      if (b.limit(1).count() > 0) stage(t, b, id)
    }
    assert(SnapshotTxn.latestTxn(spark, root) == 2)
    ()
  }

  test("checkpoint reset against an existing log: pre-watermark batches skip silently (the documented footgun)") {
    // The txn-level twin of SnapshotStreamSpec's checkpoint-reset pin:
    // a fresh checkpoint restarts batch ids at 0, and lastTagged's
    // `j >= batchId` watermark reads them all as replays — silent skip,
    // never a double-apply, and a silent DROP if the destination was
    // recycled for a new feed (the doc's named footgun).
    val out = tmp("graft-txckr")
    val (root, sDir, dDir) = (s"$out/root", s"$out/s", s"$out/d")
    val stage = regStage(sDir, dDir)
    Ingest.applyTxnBatch(spark, root, Seq((1L, "a")).toDF("id", "v"), 0L)(stage)
    Ingest.applyTxnBatch(spark, root, Seq((2L, "b")).toDF("id", "v"), 1L)(stage)
    assert(SnapshotTxn.latestTxn(spark, root) == 2)
    // ids restart at 0 with different data: both skip, neither table moves
    Ingest.applyTxnBatch(spark, root, Seq((9L, "x")).toDF("id", "v"), 0L)(stage)
    Ingest.applyTxnBatch(spark, root, Seq((8L, "y")).toDF("id", "v"), 1L)(stage)
    assert(SnapshotTxn.latestTxn(spark, root) == 2)
    assert(rows(SnapshotTxn.readLatest(spark, root, sDir).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    assert(SnapshotTxn.readLatest(spark, root, dDir).count() == 2)
    // the first id above the watermark commits one txn across both tables
    Ingest.applyTxnBatch(spark, root, Seq((3L, "c")).toDF("id", "v"), 2L)(stage)
    assert(SnapshotTxn.latestTxn(spark, root) == 3)
    assert(SnapshotTxn.readLatest(spark, root, sDir).count() == 3)
    assert(SnapshotTxn.readLatest(spark, root, dDir).count() == 3)
    ()
  }
}
