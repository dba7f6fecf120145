package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 advice fixes + the O(V) history contract:
  *  - replaceSnapshotRange must never lose NULL-valued base rows (parquet
  *    min/max ignore nulls, so stats-classification alone would Drop
  *    them); a violating batch aborts without committing anything;
  *  - every commit records its exact row count in a `#rows` header, so
  *    snapshotHistory answers counts from V version files alone —
  *    pinned by deleting the delta manifests and asking again;
  *  - pre-header manifests (bloom-indexed odd-arity lines included)
  *    still report exact counts via the line-count fallback.
  */
class SnapshotRowsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  test("replaceSnapshotRange preserves null-stats rows in fully-inside files") {
    val dest = tmp("graft-rnull")
    // one file whose NON-NULL k values lie entirely inside the replaced
    // range but which also holds a null-k row: min/max say Drop, the
    // footer null count must demote it to Rewrite
    val base = Seq((Some(300L), "a"), (Some(350L), "b"), (None, "n"))
      .toDF("k", "v").coalesce(1)
    Snapshot.publishSnapshot(base, dest, statsCol = Some("k"))
    val v = Snapshot.replaceSnapshotRange(
      Seq((250L, "r")).toDF("k", "v")
        .select(col("k").cast("long").as("k"), col("v")),
      dest, 200L, 400L)
    val out = Snapshot.readSnapshot(spark, dest, v)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1))).toSet
    // in-range rows replaced by the batch; the null row SURVIVES
    assert(out === Set((250L, "r"), (-1L, "n")))
  }

  test("replace survivor filter keeps null rows of straddling files") {
    val dest = tmp("graft-rnull2")
    val base = Seq((Some(100L), "lo"), (Some(300L), "mid"), (None, "n"))
      .toDF("k", "v").coalesce(1)
    Snapshot.publishSnapshot(base, dest, statsCol = Some("k"))
    // [200, 400] straddles the file ([100, 300] bounds) → Rewrite path
    val v = Snapshot.replaceSnapshotRange(
      Seq((250L, "r")).toDF("k", "v")
        .select(col("k").cast("long").as("k"), col("v")), dest, 200L, 400L)
    val out = Snapshot.readSnapshot(spark, dest, v)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1))).toSet
    assert(out === Set((100L, "lo"), (250L, "r"), (-1L, "n")))
  }

  test("replace contract violation aborts before any commit (checked rows ARE written rows)") {
    val dest = tmp("graft-rviol")
    Snapshot.publishSnapshot(
      (0L until 100L).map(k => (k, s"n$k")).toDF("k", "v"), dest,
      statsCol = Some("k"))
    // out-of-range row and null row both refuse, and neither commits
    intercept[IllegalArgumentException] {
      Snapshot.replaceSnapshotRange(
        Seq((10L, "ok"), (99L, "bad")).toDF("k", "v"), dest, 0L, 50L)
    }
    intercept[IllegalArgumentException] {
      Snapshot.replaceSnapshotRange(
        Seq((Some(10L), "ok"), (None, "null")).toDF("k", "v")
          .select(col("k").cast("long").as("k"), col("v")),
        dest, 0L, 50L)
    }
    assert(Snapshot.latestVersion(spark, dest) == 1)
    // and the table still reads exactly as published
    assert(Snapshot.readSnapshot(spark, dest, 1).count() == 100)
  }

  test("snapshotHistory is O(versions): exact counts with every delta manifest deleted") {
    val dest = tmp("graft-hist")
    val mk = (r: Range) => r.map(k => (k.toLong, s"n$k")).toDF("k", "v")
    Snapshot.publishSnapshot(mk(0 until 100).repartition(2), dest,
      statsCol = Some("k"))
    Snapshot.appendSnapshot(mk(100 until 150), dest)
    // merge: whole-row replace of 10 + insert of 5 → 155
    Snapshot.mergeSnapshot(mk(140 until 155), dest, "k")
    // MoR merge: physical rows grow by the batch (superseded included)
    Snapshot.mergeSnapshotMoR(mk(0 until 7), dest, "k")
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(
      spark.sessionState.newHadoopConf())
    // kill every delta manifest: history must not notice
    val man = new org.apache.hadoop.fs.Path(s"$dest/manifest")
    fs.listStatus(man).map(_.getPath.getName)
      .filter(n => n.startsWith("d") && n.endsWith(".txt"))
      .foreach(n => fs.delete(
        new org.apache.hadoop.fs.Path(s"$dest/manifest/$n"), false))
    val h = Snapshot.snapshotHistory(spark, dest)
      .orderBy("version")
      .collect().map(r => (r.getInt(0), r.getLong(3), r.getBoolean(4)))
    assert(h === Array((1, 100L, false), (2, 150L, false),
      (3, 155L, false), (4, 162L, true)))
  }

  test("appendSnapshotIndexed keeps the bloom: point skips span base + delta") {
    val dest = tmp("graft-bapp")
    val mk = (r: Range) => r.map(k => (k.toLong, s"key$k"))
      .toDF("k", "name")
    Snapshot.publishSnapshotIndexed(mk(0 until 40).repartition(2), dest,
      Seq("k"), "name")
    val v2 = Snapshot.appendSnapshotIndexed(mk(40 until 60).repartition(2),
      dest)
    assert(v2 == 2)
    // point lookups prune across BOTH generations: a base key's lookup
    // opens a strict subset of the 4 files, and so does a delta key's
    val fBase = Snapshot.filesForKey(spark, dest, 2, "key7")
    val fDelta = Snapshot.filesForKey(spark, dest, 2, "key55")
    val all = Snapshot.manifestLines(spark, dest, 2).size
    assert(all == 4 && fBase.size < all && fDelta.size < all,
      s"bloom skipping lost: base=${fBase.size} delta=${fDelta.size} of $all")
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 2, "key55"))
      === Seq(Seq(55L, "key55")))
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 2, "key7"))
      === Seq(Seq(7L, "key7")))
    // stats text survives on carried AND new lines; #rows header exact
    assert(Snapshot.filesForRange(spark, dest, 2, 45L, 46L).size < all)
    assert(rows(Snapshot.snapshotHistory(spark, dest))
      .map(r => (r(0), r(3))) === Seq((1, 40L), (2, 60L)))
    // v1 time-travels; an un-indexed base refuses the indexed append
    assert(Snapshot.readSnapshot(spark, dest, 1).count() == 40)
    val plain = tmp("graft-bapp2")
    Snapshot.publishSnapshot(mk(0 until 5), plain)
    intercept[IllegalArgumentException] {
      Snapshot.appendSnapshotIndexed(mk(5 until 8), plain)
    }
  }

  test("merge, replaceRange, dropColumn all keep the bloom on an indexed table") {
    val dest = tmp("graft-blife")
    val mk = (r: Range) => r.map(k => (k.toLong, s"key$k", s"x$k"))
      .toDF("k", "name", "extra")
    Snapshot.publishSnapshotIndexed(
      mk(0 until 400).repartitionByRange(8, col("k")), dest,
      Seq("k"), "name")
    // copy-on-write MERGE: touched file rewritten with fresh words,
    // untouched carried with theirs
    val v2 = Snapshot.mergeSnapshot(
      Seq((7L, "key7", "UPD"), (900L, "key900", "NEW"))
        .toDF("k", "name", "extra"), dest, "k")
    assert(v2 == 2)
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 2, "key7")) ===
      Seq(Seq(7L, "key7", "UPD")))
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 2, "key900")) ===
      Seq(Seq(900L, "key900", "NEW")))
    assert(Snapshot.filesForKey(spark, dest, 2, "key123").size <
      Snapshot.manifestLines(spark, dest, 2).size)
    // replaceWhere: in-range files drop/rewrite with fresh words,
    // disjoint carry theirs; the replaced key reads its NEW row
    val v3 = Snapshot.replaceSnapshotRange(
      Seq((100L, "key100", "REPL")).toDF("k", "name", "extra"),
      dest, 100L, 149L)
    assert(v3 == 3)
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 3, "key100")) ===
      Seq(Seq(100L, "key100", "REPL")))
    assert(Snapshot.readSnapshotPoint(spark, dest, 3, "key120").count() == 0)
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 3, "key7")) ===
      Seq(Seq(7L, "key7", "UPD")))
    // the replace PRUNED: only straddle/in-range files were rewritten
    // (the arity-aware classifier — a words-blind one rewrites all 8)
    assert(Snapshot.readSnapshot(spark, dest, 3).count() == 352)
    // metadata-only column drop keeps the index live
    val v4 = Snapshot.dropSnapshotColumn(spark, dest, "extra")
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 4, "key7")) ===
      Seq(Seq(7L, "key7")))
    // dropping the bloom column itself refuses
    intercept[IllegalArgumentException] {
      Snapshot.dropSnapshotColumn(spark, dest, "name")
    }
    // the dropped-name fence rides the indexed merge lane too
    intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshot(
        Seq((1L, "key1", "zombie")).toDF("k", "name", "extra"), dest, "k")
    }
    ()
  }

  test("compactSnapshot keeps the bloom: packed files get fresh words, carried keep theirs") {
    val dest = tmp("graft-bcmp")
    val mk = (r: Range) => r.map(k => (k.toLong, s"key$k"))
      .toDF("k", "name")
    // one big base file + three small indexed appends (the streaming-fed
    // indexed table shape that NEEDS compaction)
    Snapshot.publishSnapshotIndexed(mk(0 until 1000).coalesce(1), dest,
      Seq("k"), "name")
    Snapshot.appendSnapshotIndexed(mk(1000 until 1005).coalesce(1), dest)
    Snapshot.appendSnapshotIndexed(mk(1005 until 1010).coalesce(1), dest)
    Snapshot.appendSnapshotIndexed(mk(1010 until 1015).coalesce(1), dest)
    val v = Snapshot.compactSnapshot(spark, dest, minRows = 100L,
      targetRows = 10000L)
    assert(v == 5)
    // the three smalls packed into one; the big file carried by ref
    val lines = Snapshot.manifestLines(spark, dest, 5)
    assert(lines.size == 2, lines.mkString("\n"))
    // content exact, point skipping live on BOTH generations
    assert(Snapshot.readSnapshot(spark, dest, 5).count() == 1015)
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 5, "key1007"))
      === Seq(Seq(1007L, "key1007")))
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 5, "key7"))
      === Seq(Seq(7L, "key7")))
    assert(Snapshot.readSnapshotPoint(spark, dest, 5, "nope").count() == 0)
    assert(Snapshot.filesForKey(spark, dest, 5, "key1007").size < 2)
    // stats + #rows survive the indexed compaction
    assert(Snapshot.filesForRange(spark, dest, 5, 0L, 10L).size < 2)
    assert(rows(Snapshot.snapshotHistory(spark, dest)).last match {
      case Seq(5, _, _, n: Long, _*) => n == 1015L
      case other => fail(s"unexpected history row: $other")
    })
  }

  test("versionAsOf resolves commit times; snapshotFiles reads manifest text only") {
    val dest = tmp("graft-asof")
    val mk = (r: Range) => r.map(k => (k.toLong, s"n$k")).toDF("k", "v")
    Snapshot.publishSnapshot(mk(0 until 10).coalesce(1), dest,
      statsCol = Some("k"))
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(
      spark.sessionState.newHadoopConf())
    def mtime(v: Int) = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$dest/manifest/v$v.txt"))
      .getModificationTime
    Thread.sleep(20)
    Snapshot.appendSnapshot(mk(10 until 15).coalesce(1), dest)
    // before v1: nothing; between the commits: v1; after both: v2
    assert(Snapshot.versionAsOf(spark, dest, mtime(1) - 10).isEmpty)
    assert(Snapshot.versionAsOf(spark, dest, mtime(1)).contains(1))
    assert(Snapshot.versionAsOf(spark, dest,
      (mtime(1) + mtime(2)) / 2).contains(1))
    assert(Snapshot.versionAsOf(spark, dest,
      System.currentTimeMillis() + 1000).contains(2))
    // snapshotFiles: manifest-text introspection, exact counts + bounds
    Snapshot.mergeSnapshotMoR(mk(3 until 5), dest, "k")
    val files = Snapshot.snapshotFiles(spark, dest, 3).collect()
    assert(files.count(_.getString(1) == "delete") >= 1)
    val v1row = files.find(r => r.getString(0).contains("data/v1/")).get
    assert(v1row.getLong(2) == 10L && v1row.getLong(3) == 0L &&
      v1row.getLong(4) == 9L)
    // vacuumed interior versions resolve to nothing, never a later one
    Snapshot.reconcileSnapshotMoR(spark, dest)
    Snapshot.vacuum(spark, dest, keepFrom = 4)
    assert(Snapshot.versionAsOf(spark, dest, mtime(4) - 1).isEmpty)
  }

  test("pre-header manifests (bloom odd-arity lines) fall back to exact line counts") {
    val dest = tmp("graft-histb")
    val df = (0L until 60L).map(k => (k, s"u$k")).toDF("k", "v")
      .repartition(3)
    Snapshot.publishSnapshotIndexed(df, dest, Seq("k"), "v")
    // strip the #rows header to simulate a round-11 manifest whose
    // bloom lines are odd-arity (path, rows, mn, mx, words)
    val fs = new org.apache.hadoop.fs.Path(dest).getFileSystem(
      spark.sessionState.newHadoopConf())
    val p = new org.apache.hadoop.fs.Path(s"$dest/manifest/v1.txt")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(txt.contains("#rows=60"))
    val stripped = txt.split("\n").filterNot(_.startsWith("#rows="))
    fs.delete(p, false)
    val out = fs.create(p, true)
    out.write(stripped.mkString("\n").getBytes("UTF-8")); out.close()
    val h = Snapshot.snapshotHistory(spark, dest).collect()
    assert(h.length == 1 && !h(0).isNullAt(3) && h(0).getLong(3) == 60L,
      s"bloom-arity fallback broke: ${h.mkString(";")}")
  }
}
