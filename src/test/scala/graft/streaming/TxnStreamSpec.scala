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
}
