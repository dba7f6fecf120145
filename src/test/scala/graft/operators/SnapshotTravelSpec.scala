package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot layout semantics beyond the gate row: time-travel
  * immutability across later publishes, append-by-reference (old files
  * carried, not copied), full-rewrite versions, and crash invisibility
  * (a .tmp manifest is not a version).
  */
class SnapshotTravelSpec extends SparkSpec {
  import spark.implicits._

  test("append carries old files by reference; old versions stay bit-identical") {
    val dest = java.nio.file.Files.createTempDirectory("graft-tt").toString
    val v1 = Snapshot.publishSnapshot(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dest)
    assert(v1 == 1)
    val v1Rows = rows(Snapshot.readSnapshot(spark, dest, 1).orderBy("k"))

    val v2 = Snapshot.appendSnapshot(Seq((3L, "c")).toDF("k", "v"), dest)
    assert(v2 == 2)
    // v1 unchanged AFTER the append (time travel)
    assert(rows(Snapshot.readSnapshot(spark, dest, 1).orderBy("k")) === v1Rows)
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // the append REFERENCED v1's files rather than rewriting them:
    // v2's resolved manifest names files under data/v1/
    val l2 = Snapshot.manifestLines(spark, dest, 2)
    assert(l2.exists(_.contains("data/v1/")),
      s"expected carried v1 files in:\n${l2.mkString("\n")}")
    assert(l2.exists(_.contains("data/v2/")))
    // and the version FILE is a manifest list: it carries one-line
    // delta-manifest references, not the expanded file inventory —
    // the commit stays O(versions), not O(total files)
    val raw2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/manifest/v2.txt")), "UTF-8")
    assert(raw2.contains("@manifest/d"), raw2)
    assert(!raw2.contains("part-"), s"expected references, not inline:\n$raw2")

    // full rewrite: v3 sees only its own content; v1/v2 still readable
    val v3 = Snapshot.publishSnapshot(Seq((9L, "z")).toDF("k", "v"), dest)
    assert(v3 == 3)
    assert(rows(Snapshot.readSnapshot(spark, dest, 3)) === Seq(Seq(9L, "z")))
    assert(rows(Snapshot.readSnapshot(spark, dest, 1).orderBy("k")) === v1Rows)
    assert(Snapshot.latestVersion(spark, dest) == 3)
  }

  test("a crashed publish (.tmp manifest) is not a version") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttc").toString
    Snapshot.publishSnapshot(Seq((1L, "a")).toDF("k", "v"), dest)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dest/manifest/.tmp_v2"),
      "data/v2/part-bogus".getBytes("UTF-8"))
    assert(Snapshot.latestVersion(spark, dest) == 1)
    // and the next real publish claims v2 cleanly
    assert(Snapshot.appendSnapshot(Seq((2L, "b")).toDF("k", "v"), dest) == 2)
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
  }

  test("a stale claim (crashed publisher) skips the STAGING id, not the version") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttcl").toString
    Snapshot.publishSnapshot(Seq((1L, "a")).toDF("k", "v"), dest)
    // a publisher that claimed staging id 2 and died before committing:
    // the claim is permanent (reusing the id would let a zombie holder
    // clobber a new owner's data dir), so the next publish stages under
    // data/v3 — but VERSION numbers are assigned at commit and stay
    // contiguous, so it still commits as version 2
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dest/manifest/.claim_v2"),
      Array.empty[Byte])
    assert(Snapshot.appendSnapshot(Seq((2L, "b")).toDF("k", "v"), dest) == 2)
    assert(Snapshot.latestVersion(spark, dest) == 2)
    val l2 = Snapshot.manifestLines(spark, dest, 2)
    assert(l2.exists(_.contains("data/v3/")),
      s"expected the delta staged under the NEXT free id:\n${l2.mkString("\n")}")
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
  }

  test("merge switching statsCol strips carried stats instead of misreading") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttsx").toString
    val base = (0L until 800L).map(k => (k, k + 1000L, s"n$k"))
      .toDF("k", "ts", "v").repartitionByRange(8, col("k"))
    Snapshot.publishSnapshot(base, dest, statsCol = Some("k"))
    Snapshot.mergeSnapshot(Seq((100L, 1100L, "UP")).toDF("k", "ts", "v"),
      dest, "k", statsCol = Some("ts"))
    // carried files' old k-stats (max 799) must NOT be read as ts stats:
    // this ts-range lives entirely in carried files and would be pruned
    // to zero rows if the stale min/max survived the header switch
    val got = rows(Snapshot.readSnapshotRange(spark, dest, 2, 1700L, 1710L)
      .orderBy("ts")).map(_(1))
    assert(got === (1700L to 1710L))
  }

  test("manifest stats prune files; pruned read equals the full filter") {
    val dest = java.nio.file.Files.createTempDirectory("graft-tts").toString
    val df = (0L until 800L).map(k => (k, s"n$k")).toDF("k", "name")
      .repartitionByRange(8, col("k"))
    Snapshot.publishSnapshot(df, dest, statsCol = Some("k"))
    val all = Snapshot.filesForRange(spark, dest, 1, Long.MinValue,
      Long.MaxValue)
    val some = Snapshot.filesForRange(spark, dest, 1, 100, 199)
    assert(all.size == 8)
    assert(some.size < all.size,
      s"expected pruning, got ${some.size} of ${all.size}")
    val pruned = rows(Snapshot.readSnapshotRange(spark, dest, 1, 100, 199)
      .orderBy("k"))
    val full = rows(Snapshot.readSnapshot(spark, dest, 1)
      .filter(col("k").between(100, 199)).orderBy("k"))
    assert(pruned === full)
  }

  test("compactSnapshot rewrites only small files; big files carried") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttk").toString
    val big = (0L until 400L).map(k => (k, s"n$k")).toDF("k", "v")
      .repartitionByRange(2, col("k"))
    Snapshot.publishSnapshot(big, dest, statsCol = Some("k"))
    // three micro-batch-sized appends (the snapshotStream accretion)
    Seq(Seq((900L, "a")), Seq((901L, "b"), (902L, "c")), Seq((903L, "d")))
      .foreach(b => Snapshot.appendSnapshot(b.toDF("k", "v").coalesce(1),
        dest, statsCol = Some("k")))
    assert(Snapshot.manifestLines(spark, dest, 4).size == 5) // 2 big + 3 small
    val v = Snapshot.compactSnapshot(spark, dest, minRows = 100L,
      targetRows = 1000L)
    assert(v == 5)
    val lines5 = Snapshot.manifestLines(spark, dest, 5)
    // the 2 big base files carried BY REFERENCE, the 3 small ones
    // bin-packed into a single rewritten file
    val m5 = lines5.mkString("\n")
    assert(lines5.count(_.contains("data/v1/")) == 2, m5)
    assert(lines5.count(_.contains("data/v5/")) == 1, m5)
    assert(lines5.size == 3, m5)
    // contents identical to pre-compaction; stats survive (range prune)
    assert(rows(Snapshot.readSnapshot(spark, dest, 5).orderBy("k")) ===
      rows(Snapshot.readSnapshot(spark, dest, 4).orderBy("k")))
    assert(Snapshot.filesForRange(spark, dest, 5, 900, 905).size == 1)
    // nothing left to pack: idempotent no-op returns the current version
    assert(Snapshot.compactSnapshot(spark, dest, 100L, 1000L) == 5)
  }

  test("replaceSnapshotRange: inside files drop unread, edges rewrite, rest carry") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttrw").toString
    // 8 range files of 100 keys each over 0..799
    val base = (0L until 800L).map(k => (k, s"n$k")).toDF("k", "v")
      .repartitionByRange(8, col("k"))
    Snapshot.publishSnapshot(base, dest, statsCol = Some("k"))
    // replace [150, 450]: [100-199] and [400-499] straddle (rewrite),
    // [200-299] and [300-399] are fully inside (drop, zero bytes read),
    // the other four carry by reference
    val batch = (150L to 450L by 3L).map(k => (k, s"R$k")).toDF("k", "v")
    val v = Snapshot.replaceSnapshotRange(batch, dest, 150L, 450L)
    assert(v == 2)
    val l2 = Snapshot.manifestLines(spark, dest, 2)
    assert(l2.count(_.contains("data/v1/")) == 4,
      s"expected 4 carried base files:\n${l2.mkString("\n")}")
    assert(l2.exists(_.contains("data/v2/")))
    // content: outside rows intact, inside rows exactly the batch
    val out = Snapshot.readSnapshot(spark, dest, 2)
    val expect = ((0L until 150L) ++ (451L until 800L)).map(k => k -> s"n$k") ++
      (150L to 450L by 3L).map(k => k -> s"R$k")
    assert(out.collect().map(r => r.getLong(0) -> r.getString(1)).toSet ===
      expect.toSet)
    // the two dropped files' rows are gone even though never read
    assert(out.filter(col("k") === 250L).count() == 0)
    // stats survive: range reads still prune and stay exact
    assert(Snapshot.filesForRange(spark, dest, 2, 700, 710).size <
      l2.size)
    assert(rows(Snapshot.readSnapshotRange(spark, dest, 2, 700, 710)
      .orderBy("k")).map(_.head) === (700L to 710L))
    // v1 time-travels untouched
    assert(Snapshot.readSnapshot(spark, dest, 1).count() == 800)
    // contract: a batch row outside the range refuses
    intercept[IllegalArgumentException] {
      Snapshot.replaceSnapshotRange(Seq((800L, "x")).toDF("k", "v"),
        dest, 150L, 450L)
    }
    ()
  }

  test("versionForTag resolves the newest version carrying the tag") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttt").toString
    Snapshot.publishSnapshot(Seq((1L, "a")).toDF("k", "v"), dest,
      tag = Some("b0"))
    Snapshot.appendSnapshot(Seq((2L, "b")).toDF("k", "v"), dest,
      tag = Some("b1"))
    Snapshot.appendSnapshot(Seq((3L, "c")).toDF("k", "v"), dest,
      tag = Some("b2"))
    assert(Snapshot.versionForTag(spark, dest, "b1").contains(2))
    assert(Snapshot.versionForTag(spark, dest, "b2").contains(3))
    assert(Snapshot.versionForTag(spark, dest, "nope").isEmpty)
  }

  test("Z-ordered publish: box reads open only overlapping file boxes") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttz").toString
    // a 64×64 grid, z-published into 16 contiguous curve segments —
    // each file covers a compact 2-D region, so a small box touches few
    val df = spark.range(4096).select((col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y"), col("id").as("payload"))
    Snapshot.publishSnapshotZOrdered(df, dest, "x", "y", bits = 6,
      nFiles = 16)
    assert(Snapshot.filesForBox(spark, dest, 1, 0, 63, 0, 63).size == 16)
    val few = Snapshot.filesForBox(spark, dest, 1, 10, 20, 10, 20)
    assert(few.nonEmpty && few.size <= 8,
      s"expected 2-D pruning, got ${few.size} of 16 files")
    val box = rows(Snapshot.readSnapshotBox(spark, dest, 1, 10, 20, 10, 20)
      .orderBy("payload"))
    val full = rows(Snapshot.readSnapshot(spark, dest, 1)
      .filter(col("x").between(10, 20) && col("y").between(10, 20))
      .orderBy("payload"))
    assert(box === full && box.nonEmpty)
    // MERGE inherits the full two-column stats list: skipping survives
    val upd = Seq((5L, 5L, 5L)).toDF("x", "y", "payload")
    Snapshot.mergeSnapshot(upd, dest, "payload")
    val m2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dest/manifest/v2.txt")), "UTF-8")
    assert(m2.contains("#stats=x,y"), m2)
    assert(rows(Snapshot.readSnapshotBox(spark, dest, 2, 10, 20, 10, 20)
      .orderBy("payload")) === box)
    assert(Snapshot.filesForBox(spark, dest, 2, 10, 20, 10, 20).size < 16)
  }

  test("indexed publish: range stats AND bloom skip on one version") {
    val dest = java.nio.file.Files.createTempDirectory("graft-tti").toString
    val df = (0L until 400L).map(kk => (kk, s"name_$kk")).toDF("k", "name")
      .repartitionByRange(8, col("k"))
    Snapshot.publishSnapshotIndexed(df, dest, Seq("k"), "name")
    // range side prunes and stays exact
    assert(Snapshot.filesForRange(spark, dest, 1, 100, 149).size < 8)
    assert(rows(Snapshot.readSnapshotRange(spark, dest, 1, 100, 149)
      .orderBy("k")).map(_.head) === (100L to 149L))
    // bloom side prunes and stays exact, on the SAME version
    val hits = Snapshot.filesForKey(spark, dest, 1, "name_123")
    assert(hits.nonEmpty && hits.size < 8, s"got ${hits.size} of 8")
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 1, "name_123")) ===
      Seq(Seq(123L, "name_123")))
    assert(Snapshot.readSnapshotPoint(spark, dest, 1, "nope").count() == 0)
    // an append keeps the carried STATS (words dropped with the lost
    // bloom header); content exact, range skipping still live
    Snapshot.appendSnapshot(Seq((900L, "name_900")).toDF("k", "name"), dest)
    assert(Snapshot.readSnapshot(spark, dest, 2).count() == 401)
    assert(Snapshot.filesForRange(spark, dest, 2, 100, 149).size < 9)
    assert(rows(Snapshot.readSnapshotRange(spark, dest, 2, 890, 910)) ===
      Seq(Seq(900L, "name_900")))
    // the bloom header did not survive — point reads refuse loudly
    intercept[IllegalArgumentException] {
      Snapshot.readSnapshotPoint(spark, dest, 2, "name_123")
    }
    ()
  }

  test("append with no statsCol INHERITS the base's skipping stats") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttih").toString
    Snapshot.publishSnapshot((0L until 400L).map(kk => (kk, s"n$kk"))
      .toDF("k", "v").repartitionByRange(8, col("k")), dest,
      statsCol = Some("k"))
    Snapshot.appendSnapshot(Seq((900L, "x")).toDF("k", "v"), dest)
    // v2 still prunes on k — the append didn't silently drop the stats
    assert(Snapshot.filesForRange(spark, dest, 2, 100, 149).size < 9)
    assert(rows(Snapshot.readSnapshotRange(spark, dest, 2, 890, 910)) ===
      Seq(Seq(900L, "x")))
  }

  test("rezorderSnapshot restores box skipping after unclustered appends") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttrz").toString
    val grid = spark.range(4096).select((col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y"), col("id").as("payload"))
    Snapshot.publishSnapshotZOrdered(grid, dest, "x", "y", 6, 16)
    // an unclustered append: one file spanning the whole plane
    Snapshot.appendSnapshot(
      Seq((1L, 1L, 9001L), (62L, 62L, 9002L), (15L, 50L, 9003L))
        .toDF("x", "y", "payload").coalesce(1), dest)
    val before = rows(Snapshot.readSnapshotBox(spark, dest, 2,
      10, 20, 10, 20).orderBy("payload"))
    val v3 = Snapshot.rezorderSnapshot(spark, dest, "x", "y", 6, 16)
    assert(rows(Snapshot.readSnapshotBox(spark, dest, v3,
      10, 20, 10, 20).orderBy("payload")) === before)
    assert(Snapshot.filesForBox(spark, dest, v3, 10, 20, 10, 20).size <= 8)
    assert(Snapshot.readSnapshot(spark, dest, v3).count() == 4099)
  }

  test("changedBetween reads exactly the appended files' rows") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttd").toString
    Snapshot.publishSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dest)
    Snapshot.appendSnapshot(Seq((3L, "c")).toDF("k", "v"), dest)
    assert(rows(Snapshot.changedBetween(spark, dest, 1, 2)) ===
      Seq(Seq(3L, "c")))
    assert(Snapshot.changedBetween(spark, dest, 2, 2).count() == 0)
  }

  test("vacuum drops only files no kept version references") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttv").toString
    Snapshot.publishSnapshot(Seq((1L, "a")).toDF("k", "v"), dest)  // v1
    Snapshot.appendSnapshot(Seq((2L, "b")).toDF("k", "v"), dest)   // v2 ⊃ v1
    Snapshot.publishSnapshot(Seq((9L, "z")).toDF("k", "v"), dest)  // v3 rewrite
    // keep from v3: v1/v2's files are unreferenced by v3 → deleted
    val n = Snapshot.vacuum(spark, dest, keepFrom = 3)
    assert(n >= 2, s"expected v1+v2 data dropped, deleted $n")
    assert(rows(Snapshot.readSnapshot(spark, dest, 3)) === Seq(Seq(9L, "z")))
    intercept[Exception] { Snapshot.readSnapshot(spark, dest, 1).count() }
    // kept-version reuse: append after vacuum, keepFrom latest-1 keeps
    // carried files alive
    Snapshot.appendSnapshot(Seq((10L, "y")).toDF("k", "v"), dest) // v4 ⊃ v3
    assert(Snapshot.vacuum(spark, dest, keepFrom = 4) == 0,
      "v4 still references v3's files — nothing may be deleted")
    assert(rows(Snapshot.readSnapshot(spark, dest, 4).orderBy("k")) ===
      Seq(Seq(9L, "z"), Seq(10L, "y")))
  }

  test("bloom manifest admits only files that can hold the key") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttb").toString
    val df = (0L until 400L).map(k => (k, s"name_$k")).toDF("k", "name")
      .repartition(8, col("k"))
    Snapshot.publishSnapshotBloom(df, dest, keyCol = "name")
    val hits = Snapshot.filesForKey(spark, dest, 1, "name_123")
    assert(hits.nonEmpty && hits.size < 8,
      s"expected bloom pruning, got ${hits.size} of 8 files")
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 1, "name_123")) ===
      Seq(Seq(123L, "name_123")))
    // absent key: usually zero admitting files; NEVER a wrong row
    assert(Snapshot.readSnapshotPoint(spark, dest, 1, "nope").count() == 0)
    // compaction keeps the index: the 8 small files (word-only lines
    // carry no row counts, so all are conservatively packable) rewrite
    // into one packed file with fresh words, and the probe stays exact
    val vC = Snapshot.compactSnapshot(spark, dest, 1000L, 10000L)
    assert(vC == 2)
    assert(Snapshot.manifestLines(spark, dest, 2).size == 1)
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 2, "name_123")) ===
      Seq(Seq(123L, "name_123")))
    assert(Snapshot.readSnapshotPoint(spark, dest, 2, "nope").count() == 0)
    ()
  }

  test("append without a base refuses") {
    val dest = java.nio.file.Files.createTempDirectory("graft-tte").toString
    intercept[IllegalArgumentException] {
      Snapshot.appendSnapshot(Seq((1L, "a")).toDF("k", "v"), dest)
    }
    ()
  }

  test("add-column evolution: carried files null-fill, nothing rewritten") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttv").toString
    Snapshot.publishSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dest)
    val mtimes = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$dest/data/v1")).toArray.toSeq
      .map(_.toString).sorted
    Snapshot.appendSnapshot(
      Seq((3L, "c", 30L)).toDF("k", "v", "extra"), dest)
    // evolved read: old rows null-fill the new column, new row carries it
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a", null), Seq(2L, "b", null), Seq(3L, "c", 30L)))
    // v1 read under ITS schema still has no 'extra' column (time travel
    // of the schema itself)
    assert(Snapshot.readSnapshot(spark, dest, 1).columns.toSeq ===
      Seq("k", "v"))
    // no v1 data file was rewritten by the evolution
    assert(java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$dest/data/v1")).toArray.toSeq
      .map(_.toString).sorted === mtimes)
    // changedBetween sees the delta under the evolved schema
    assert(rows(Snapshot.changedBetween(spark, dest, 1, 2)) ===
      Seq(Seq(3L, "c", 30L)))
  }

  test("merge rewrites only touched files; untouched carried by reference") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttm").toString
    val base = (0L until 800L).map(k => (k, s"n$k", k * 10))
      .toDF("k", "name", "v").repartitionByRange(8, col("k"))
    Snapshot.publishSnapshot(base, dest, statsCol = Some("k"))
    // updates hit keys 100..109 (one range file) + one brand-new key
    val updates = ((100L until 110L).map(k => (k, s"UP$k", k * 100)) :+
      (9999L, "NEW", 42L)).toDF("k", "name", "v")
    val v = Snapshot.mergeSnapshot(updates, dest, "k")
    assert(v == 2)
    val l2 = Snapshot.manifestLines(spark, dest, 2)
    val m2 = l2.mkString("\n")
    val carried = l2.count(_.contains("data/v1/"))
    val rewritten = l2.count(_.contains("data/v2/"))
    assert(carried >= 6,
      s"expected most of the 8 base files carried by reference:\n$m2")
    assert(rewritten >= 1, m2)
    // values: replaced rows replaced, new key inserted, rest intact
    val out = Snapshot.readSnapshot(spark, dest, 2)
    assert(out.count() == 801)
    assert(rows(out.filter(col("k") === 105L)) === Seq(Seq(105L, "UP105", 10500L)))
    assert(rows(out.filter(col("k") === 9999L)) === Seq(Seq(9999L, "NEW", 42L)))
    assert(rows(out.filter(col("k") === 500L)) === Seq(Seq(500L, "n500", 5000L)))
    // stats survive the merge without restating: range read still prunes
    val hit = Snapshot.filesForRange(spark, dest, 2, 700, 710)
    assert(hit.size < 8, s"expected stats pruning on v2, got $hit")
    assert(rows(Snapshot.readSnapshotRange(spark, dest, 2, 700, 710)
        .orderBy("k")).map(_.head) === (700L to 710L))
    // v1 time travel unaffected
    assert(rows(Snapshot.readSnapshot(spark, dest, 1)
      .filter(col("k") === 105L)) === Seq(Seq(105L, "n105", 1050L)))
  }

  test("merge guard: updates missing a base column refuse; new columns evolve") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttmg").toString
    Snapshot.publishSnapshot(
      Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "name", "v"), dest)
    intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshot(Seq((1L, "x")).toDF("k", "name"), dest, "k")
    }
    // merge carrying a NEW column: replaced+inserted rows have it,
    // survivors null-fill
    Snapshot.mergeSnapshot(
      Seq((2L, "B", 20L, "tag2")).toDF("k", "name", "v", "tag"), dest, "k")
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a", 1L, null), Seq(2L, "B", 20L, "tag2")))
  }

  test("evolution guard: dropped or retyped fields refuse to append") {
    val dest = java.nio.file.Files.createTempDirectory("graft-ttg").toString
    Snapshot.publishSnapshot(Seq((1L, "a")).toDF("k", "v"), dest)
    intercept[IllegalArgumentException] {   // dropped column
      Snapshot.appendSnapshot(Seq(Tuple1(2L)).toDF("k"), dest)
    }
    intercept[IllegalArgumentException] {   // retyped column
      Snapshot.appendSnapshot(Seq((2, "b")).toDF("k", "v"), dest)
    }
    ()
  }
}
