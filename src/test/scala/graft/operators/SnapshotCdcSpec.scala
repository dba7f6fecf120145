package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The shared streaming-CDC mechanism (SnapshotCdc): windowed pump
  * equivalence with batch changedBetween, watermark resume, replay
  * semantics (crash between process and advance), bootstrap-from-zero,
  * the append-only refusal, and the snapshot-fed index refresher
  * re-expressed on it.
  */
class SnapshotCdcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def kv(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  test("pump one-version windows ≡ changedBetween per version; watermark resumes") {
    val src = tmp("graft-cdc-s"); val ckp = tmp("graft-cdc-c")
    Snapshot.publishSnapshot(kv(1L -> "a", 2L -> "b"), src)
    Snapshot.appendSnapshot(kv(3L -> "c"), src)
    Snapshot.appendSnapshot(kv(4L -> "d", 5L -> "e"), src)
    val seen = scala.collection.mutable.Map.empty[Int, Set[Long]]
    val n = SnapshotCdc.pump(spark, src, ckp, maxVersionsPerBatch = 1) {
      d => seen(d.toVersion) =
        d.rows.select("k").collect().map(_.getLong(0)).toSet
    }
    assert(n == 3)
    assert(seen(1) === Set(1L, 2L)) // bootstrap window = full v1
    assert(seen(2) === Set(3L))
    assert(seen(3) === Set(4L, 5L))
    assert(SnapshotCdc.appliedVersion(spark, ckp) == 3)
    // nothing new: no windows, no process calls
    assert(SnapshotCdc.pump(spark, src, ckp)(_ => fail("no new data")) == 0)
    // new commit: exactly the tail window fires
    Snapshot.appendSnapshot(kv(6L -> "f"), src)
    val m = SnapshotCdc.pump(spark, src, ckp) { d =>
      assert(d.fromVersion == 3 && d.toVersion == 4)
      assert(d.rows.select("k").collect().map(_.getLong(0)).toSet ===
        Set(6L))
    }
    assert(m == 1)
  }

  test("crash between process and advance replays the window verbatim") {
    val src = tmp("graft-cdc-s2"); val ckp = tmp("graft-cdc-c2")
    Snapshot.publishSnapshot(kv(1L -> "a"), src)
    Snapshot.appendSnapshot(kv(2L -> "b"), src)
    var calls = 0
    intercept[RuntimeException] {
      SnapshotCdc.pump(spark, src, ckp, maxVersionsPerBatch = 1) { d =>
        calls += 1
        if (d.toVersion == 2) throw new RuntimeException("die mid-window")
      }
    }
    // window 1 applied, window 2 died BEFORE its watermark advance
    assert(calls == 2)
    assert(SnapshotCdc.appliedVersion(spark, ckp) == 1)
    // the re-pump replays exactly window (1, 2]
    val replayed = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    SnapshotCdc.pump(spark, src, ckp, maxVersionsPerBatch = 1) { d =>
      replayed += ((d.fromVersion, d.toVersion))
    }
    assert(replayed.toList === List((1, 2)))
    assert(SnapshotCdc.appliedVersion(spark, ckp) == 2)
  }

  test("a compacted source refuses CDC past the rewrite") {
    val src = tmp("graft-cdc-s3"); val ckp = tmp("graft-cdc-c3")
    Snapshot.publishSnapshot(kv(1L -> "a").coalesce(1), src,
      statsCol = Some("k"))
    SnapshotCdc.pump(spark, src, ckp)(_ => ())
    Snapshot.appendSnapshot(kv(2L -> "b").coalesce(1), src)
    Snapshot.compactSnapshot(spark, src, minRows = 10L, targetRows = 100L)
    intercept[IllegalArgumentException] {
      SnapshotCdc.pump(spark, src, ckp)(_ => ())
    }
  }

  test("pumpFeed follows a merge-on-read table as change events; applier reproduces state") {
    val src = tmp("graft-cdc-s5"); val ckp = tmp("graft-cdc-c5")
    Snapshot.publishSnapshot(kv(1L -> "a", 2L -> "b"), src,
      statsCol = Some("k"))
    Snapshot.mergeSnapshotMoR(kv(2L -> "B", 3L -> "c"), src, "k")
    Snapshot.deleteSnapshotMoR(Seq(1L).toDF("k"), src, "k")
    // plain pump bootstraps fine (the full read resolves the upsert
    // log) but an INCREMENTAL window over tombstoned versions refuses —
    // pumpFeed is the follower that can cross them
    intercept[IllegalArgumentException] {
      SnapshotCdc.pump(spark, src, tmp("graft-cdc-x"),
        maxVersionsPerBatch = 1)(_ => ())
    }
    // a driver-side applier replays events into a map (key -> value)
    val state = scala.collection.mutable.Map.empty[Long, String]
    val n = SnapshotCdc.pumpFeed(spark, src, ckp, maxVersionsPerBatch = 1) {
      d => d.rows.orderBy("_commit_version").collect().foreach { r =>
        val k = r.getLong(0)
        r.getString(r.fieldIndex("_change_type")) match {
          case "delete" => state.remove(k); ()
          case _ => state(k) = r.getString(1)
        }
      }
    }
    assert(n == 3)
    assert(state.toMap === Map(2L -> "B", 3L -> "c"))
    assert(state.toMap === Snapshot.readSnapshot(spark, src, 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    // resume: one more commit, only the tail window fires
    Snapshot.mergeSnapshotMoR(kv(4L -> "d"), src, "k")
    val m = SnapshotCdc.pumpFeed(spark, src, ckp) { d =>
      assert(d.fromVersion == 3 && d.toVersion == 4)
      assert(d.rows.count() == 1)
    }
    assert(m == 1)
  }

  test("snapshot-fed index refresher: CDC-maintained index ≡ full rebuild, replay-safe") {
    val src = tmp("graft-cdc-s4"); val ckp = tmp("graft-cdc-c4")
    val idx = tmp("graft-cdc-i4") + "/index"
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    // two commits, then pump: window 1 bootstraps, window 2 refreshes
    Snapshot.publishSnapshot(
      docs(1L -> "alpha beta", 2L -> "beta gamma"), src)
    Snapshot.appendSnapshot(docs(3L -> "alpha delta"), src)
    val n1 = graft.streaming.Ingest.indexSnapshotCdc(
      spark, src, idx, ckp, "doc_id", toks, maxDf = 2L,
      maxVersionsPerBatch = 1)
    assert(n1 == 2)
    def readIdx() = spark.read.parquet(idx)
      .select(col("tok"), col("df"),
        array_join(col("postings"), ",").as("p"))
      .orderBy("tok").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val full = InvertedIndex.build(
      Snapshot.readSnapshot(spark, src, 2), "doc_id", toks, 2L)
      .select(col("tok"), col("df"),
        array_join(col("postings"), ",").as("p"))
      .orderBy("tok").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(readIdx() === full) // incl. alpha df=2 at cap, beta df=2
    // REPLAY: rewind the watermark (crash-after-apply simulation) — the
    // window's marker skips the merge, df never double-counts
    val fs = new org.apache.hadoop.fs.Path(ckp).getFileSystem(
      spark.sessionState.newHadoopConf())
    val wm = new org.apache.hadoop.fs.Path(s"$ckp/applied-version")
    fs.delete(wm, false)
    val out = fs.create(wm, true); out.write("1".getBytes); out.close()
    val n2 = graft.streaming.Ingest.indexSnapshotCdc(
      spark, src, idx, ckp, "doc_id", toks, maxDf = 2L)
    assert(n2 == 1)
    assert(readIdx() === full)
    // a third commit folds in incrementally and still equals a rebuild
    Snapshot.appendSnapshot(docs(4L -> "gamma epsilon"), src)
    graft.streaming.Ingest.indexSnapshotCdc(
      spark, src, idx, ckp, "doc_id", toks, maxDf = 2L)
    val full3 = InvertedIndex.build(
      Snapshot.readSnapshot(spark, src, 3), "doc_id", toks, 2L)
      .select(col("tok"), col("df"),
        array_join(col("postings"), ",").as("p"))
      .orderBy("tok").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(readIdx() === full3)
  }

  test("bootstrap replay (crash before marker / full rewind) re-publishes, never double-merges") {
    val src = tmp("graft-cdc-s5"); val ckp = tmp("graft-cdc-c5")
    val idx = tmp("graft-cdc-i5") + "/index"
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    Snapshot.publishSnapshot(docs(1L -> "alpha beta", 2L -> "beta"), src)
    Snapshot.appendSnapshot(docs(3L -> "alpha delta"), src)
    assert(graft.streaming.Ingest.indexSnapshotCdc(
      spark, src, idx, ckp, "doc_id", toks, maxDf = 10L,
      maxVersionsPerBatch = 1) == 2)
    def readIdx() = spark.read.parquet(idx)
      .select(col("tok"), col("df"),
        array_join(array_sort(col("postings")), ",").as("p"))
      .orderBy("tok").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val full = InvertedIndex.build(
      Snapshot.readSnapshot(spark, src, 2), "doc_id", toks, 10L)
      .select(col("tok"), col("df"),
        array_join(array_sort(col("postings")), ",").as("p"))
      .orderBy("tok").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(readIdx() === full)
    val fs = new org.apache.hadoop.fs.Path(ckp).getFileSystem(
      spark.sessionState.newHadoopConf())
    def rewindTo(v: Int): Unit = {
      val wm = new org.apache.hadoop.fs.Path(s"$ckp/applied-version")
      fs.delete(wm, false)
      val out = fs.create(wm, true); out.write(v.toString.getBytes)
      out.close()
    }
    // crash-before-marker: buckets are published on disk but the
    // bootstrap window never committed (no marker, watermark 0). The
    // replayed window must take the PUBLISH path — an existence-based
    // branch would merge the full corpus into the published index and
    // double every df.
    rewindTo(0)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_applied"), true)
    assert(graft.streaming.Ingest.indexSnapshotCdc(
      spark, src, idx, ckp, "doc_id", toks, maxDf = 10L,
      maxVersionsPerBatch = 1) == 2)
    assert(readIdx() === full)
    // full rewind with STALE markers from the prior life: the bootstrap
    // re-publish must wipe them so window 2 re-merges instead of
    // skipping (its docs would otherwise vanish from the index)
    rewindTo(0)
    assert(graft.streaming.Ingest.indexSnapshotCdc(
      spark, src, idx, ckp, "doc_id", toks, maxDf = 10L,
      maxVersionsPerBatch = 1) == 2)
    assert(readIdx() === full)
  }
}
