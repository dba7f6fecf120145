package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Merge-on-read semantics: O(updates) commits with tombstone
  * delete-sets, transparent read-time resolution, row-level delete,
  * sequencing across chained merges, refusal walls around the
  * unreconciled state, and the O(touched) reconcile back to pure
  * copy-on-write.
  */
class SnapshotMorSpec extends SparkSpec {
  import spark.implicits._

  private def kv(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  test("MoR merge: upserts + inserts visible, base untouched on disk, O(1) manifest growth") {
    val dest = java.nio.file.Files.createTempDirectory("graft-mor").toString
    Snapshot.publishSnapshot(
      kv(1L -> "a", 2L -> "b", 3L -> "c").repartition(2), dest,
      statsCol = Some("k"))
    val before = Snapshot.manifestLines(spark, dest, 1).map(_.split("\t").head)
    val v2 = Snapshot.mergeSnapshotMoR(kv(2L -> "B", 4L -> "D"), dest, "k")
    assert(v2 == 2)
    // content: whole-row replace + insert, same as copy-on-write merge
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c"), Seq(4L, "D")))
    // v1 time-travels untouched
    assert(rows(Snapshot.readSnapshot(spark, dest, 1).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // NO base file was rewritten: every v1 file is still referenced
    val l2 = Snapshot.manifestLines(spark, dest, 2)
    before.foreach(p => assert(l2.exists(_.startsWith(p)),
      s"base file $p missing from v2:\n${l2.mkString("\n")}"))
    // tombstone lines present, marked, pointing at the _del dir
    assert(l2.exists(l => l.startsWith("!") && l.contains("_del/")))
    ()
  }

  test("pure MoR delete drops rows without reading anything; chained merges sequence correctly") {
    val dest = java.nio.file.Files.createTempDirectory("graft-mord").toString
    Snapshot.publishSnapshot(kv(1L -> "a", 2L -> "b", 3L -> "c"), dest)
    Snapshot.mergeSnapshotMoR(kv(2L -> "B2", 4L -> "D"), dest, "k")
    Snapshot.deleteSnapshotMoR(Seq(2L, 3L).toDF("k"), dest, "k")
    // delete wins over the earlier upsert of 2; 3 gone from base
    assert(rows(Snapshot.readSnapshot(spark, dest, 3).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(4L, "D")))
    // re-merge a deleted key: the latest touch wins again
    Snapshot.mergeSnapshotMoR(kv(3L -> "C3", 4L -> "D4"), dest, "k")
    assert(rows(Snapshot.readSnapshot(spark, dest, 4).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(3L, "C3"), Seq(4L, "D4")))
    // every intermediate version still reads exactly as committed
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "B2"), Seq(3L, "c"), Seq(4L, "D")))
    ()
  }

  test("copy-on-write ops and index reads refuse a tombstoned table; null keys refuse") {
    val dest = java.nio.file.Files.createTempDirectory("graft-morr").toString
    Snapshot.publishSnapshot(kv(1L -> "a", 2L -> "b"), dest,
      statsCol = Some("k"))
    Snapshot.mergeSnapshotMoR(kv(2L -> "B"), dest, "k")
    intercept[IllegalArgumentException] {
      Snapshot.appendSnapshot(kv(5L -> "e"), dest)
    }
    intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshot(kv(5L -> "e"), dest, "k")
    }
    intercept[IllegalArgumentException] {
      Snapshot.replaceSnapshotRange(kv(1L -> "x"), dest, 1L, 1L)
    }
    intercept[IllegalArgumentException] {
      Snapshot.compactSnapshot(spark, dest, 10L, 100L)
    }
    intercept[IllegalArgumentException] {
      Snapshot.readSnapshotRange(spark, dest, 2, 1L, 2L)
    }
    intercept[IllegalArgumentException] {
      Snapshot.changedBetween(spark, dest, 1, 2)
    }
    intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshotMoR(
        Seq((Option.empty[Long], "x")).toDF("k", "v"), dest, "k")
    }
    // wrong key column refuses (the log is keyed once)
    intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshotMoR(kv(1L -> "y"), dest, "v")
    }
    ()
  }

  test("reconcile: content identical, tombstones gone, untouched files carried, COW ops re-enabled") {
    val dest = java.nio.file.Files.createTempDirectory("graft-morc").toString
    // 8 range files over 0..799 — MoR touches only keys in [100, 110]
    val base = (0L until 800L).map(k => (k, s"n$k")).toDF("k", "v")
      .repartitionByRange(8, col("k"))
    Snapshot.publishSnapshot(base, dest, statsCol = Some("k"))
    Snapshot.mergeSnapshotMoR(
      Seq((100L, "X"), (1000L, "NEW")).toDF("k", "v"), dest, "k")
    Snapshot.deleteSnapshotMoR(Seq(105L).toDF("k"), dest, "k")
    val expect = ((0L until 800L).filterNot(k => k == 100L || k == 105L)
      .map(k => Seq(k, s"n$k")) ++ Seq(Seq(100L, "X"), Seq(1000L, "NEW")))
      .sortBy(_.head.asInstanceOf[Long])
    assert(rows(Snapshot.readSnapshot(spark, dest, 3).orderBy("k")) === expect)
    val v4 = Snapshot.reconcileSnapshotMoR(spark, dest)
    assert(v4 == 4)
    val l4 = Snapshot.manifestLines(spark, dest, 4)
    assert(!l4.exists(_.startsWith("!")), l4.mkString("\n"))
    // only the ONE base file holding [100, 110] was rewritten: 7 of the
    // 8 v1 files carry by reference (stats-range narrowing + semi-join)
    assert(l4.count(_.contains("data/v1/")) == 7,
      s"expected 7 carried base files:\n${l4.mkString("\n")}")
    assert(rows(Snapshot.readSnapshot(spark, dest, 4).orderBy("k")) === expect)
    // stats survive the reconcile: range reads prune and stay exact
    assert(Snapshot.filesForRange(spark, dest, 4, 700, 710).size < l4.size)
    // copy-on-write works again
    val v5 = Snapshot.mergeSnapshot(Seq((1L, "z")).toDF("k", "v"), dest, "k")
    assert(rows(Snapshot.readSnapshot(spark, dest, v5)
      .filter(col("k") === 1L)) === Seq(Seq(1L, "z")))
    // idempotent: nothing to reconcile → same version back
    assert(Snapshot.reconcileSnapshotMoR(spark, dest) == v5)
    ()
  }

  test("MoR schema evolution: new update column null-fills base rows") {
    val dest = java.nio.file.Files.createTempDirectory("graft-more").toString
    Snapshot.publishSnapshot(kv(1L -> "a", 2L -> "b"), dest)
    Snapshot.mergeSnapshotMoR(
      Seq((2L, "B", 7L)).toDF("k", "v", "extra"), dest, "k")
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a", null), Seq(2L, "B", 7L)))
    // and the evolved column survives reconcile
    Snapshot.reconcileSnapshotMoR(spark, dest)
    assert(rows(Snapshot.readSnapshot(spark, dest, 3).orderBy("k")) ===
      Seq(Seq(1L, "a", null), Seq(2L, "B", 7L)))
    ()
  }

  test("vacuum reclaims dropped MoR versions' delta and delete files, keeps live ones") {
    val dest = java.nio.file.Files.createTempDirectory("graft-morv").toString
    Snapshot.publishSnapshot(kv(1L -> "a", 2L -> "b"), dest)
    Snapshot.mergeSnapshotMoR(kv(2L -> "B"), dest, "k")
    val v3 = Snapshot.reconcileSnapshotMoR(spark, dest)
    val expect = rows(Snapshot.readSnapshot(spark, dest, v3).orderBy("k"))
    Snapshot.vacuum(spark, dest, keepFrom = v3)
    assert(rows(Snapshot.readSnapshot(spark, dest, v3).orderBy("k")) === expect)
    // the upsert log's delete FILES are gone (vacuum reclaims by file;
    // no kept version references them)
    val delFiles = new java.io.File(s"$dest/data").listFiles()
      .filter(_.getName.endsWith("_del"))
      .flatMap(_.listFiles()).filter(_.getName.startsWith("part-"))
    assert(delFiles.isEmpty, delFiles.mkString(","))
    ()
  }

  test("streaming MoR producer: batch replay skips; crash between merge and reconcile repairs") {
    val dest = java.nio.file.Files.createTempDirectory("graft-mors").toString
    import graft.streaming.Ingest
    Ingest.applyMorBatch(kv(1L -> "a", 2L -> "b"), dest, 0L, "k")
    Ingest.applyMorBatch(kv(2L -> "B", 3L -> "c"), dest, 1L, "k",
      reconcileEvery = 2)
    // batch 0 publish, batch 1 merge, then its reconcile: 3 versions
    assert(Snapshot.latestVersion(spark, dest) == 3)
    val expect = Seq(Seq(1L, "a"), Seq(2L, "B"), Seq(3L, "c"))
    assert(rows(Snapshot.readSnapshot(spark, dest, 3).orderBy("k")) === expect)
    // full replay of batch 1 (crash after everything): no new version
    Ingest.applyMorBatch(kv(2L -> "B", 3L -> "c"), dest, 1L, "k",
      reconcileEvery = 2)
    assert(Snapshot.latestVersion(spark, dest) == 3)
    // crash BETWEEN merge and reconcile: simulate by merging batch 2
    // without its reconcile, then replaying with reconcileEvery due
    Ingest.applyMorBatch(kv(1L -> "A2"), dest, 3L, "k")
    assert(Snapshot.latestVersion(spark, dest) == 4)
    Ingest.applyMorBatch(kv(1L -> "A2"), dest, 3L, "k", reconcileEvery = 4)
    // the replay skipped the merge (tag present) but ran the reconcile
    assert(Snapshot.latestVersion(spark, dest) == 5)
    val l5 = Snapshot.manifestLines(spark, dest, 5)
    assert(!l5.exists(_.startsWith("!")), l5.mkString("\n"))
    assert(rows(Snapshot.readSnapshot(spark, dest, 5).orderBy("k")) ===
      Seq(Seq(1L, "A2"), Seq(2L, "B"), Seq(3L, "c")))
    ()
  }

  test("indexed streaming MoR producer: point reads live at every batch, through reconcile") {
    val dest = java.nio.file.Files.createTempDirectory("graft-morsi").toString
    import graft.streaming.Ingest
    Ingest.applyMorBatch(kv(1L -> "a", 2L -> "b"), dest, 0L, "k",
      indexed = true)
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 1, "2")) ===
      Seq(Seq(2L, "b")))
    Ingest.applyMorBatch(kv(2L -> "B", 3L -> "c"), dest, 1L, "k",
      indexed = true)
    // mid-stream, live tombstones: the upsert wins, inserts found
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 2, "2")) ===
      Seq(Seq(2L, "B")))
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 2, "3")) ===
      Seq(Seq(3L, "c")))
    // reconcile cycle preserves the index
    Ingest.applyMorBatch(kv(1L -> "A2"), dest, 2L, "k",
      reconcileEvery = 3, indexed = true)
    val v = Snapshot.latestVersion(spark, dest)
    assert(!Snapshot.manifestLines(spark, dest, v).exists(_.startsWith("!")))
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, v, "1")) ===
      Seq(Seq(1L, "A2")))
    assert(Snapshot.readSnapshotPoint(spark, dest, v, "9").count() == 0)
    ()
  }

  test("bloom survives keyed MoR commits: point lookups resolve live tombstones") {
    val dest = java.nio.file.Files.createTempDirectory("graft-morb").toString
    val base = (0L until 400L).map(k => (k, s"n$k")).toDF("k", "v")
      .repartitionByRange(8, col("k"))
    Snapshot.publishSnapshotIndexed(base, dest, Seq("k"), "k")
    // upsert + insert + delete, all while the index stays live
    Snapshot.mergeSnapshotMoR(
      Seq((100L, "X"), (1000L, "NEW")).toDF("k", "v"), dest, "k")
    Snapshot.deleteSnapshotMoR(Seq(105L).toDF("k"), dest, "k")
    // the upsert wins over its tombstoned base row
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 3, "100")) ===
      Seq(Seq(100L, "X")))
    // a deleted key resolves to NOTHING (a bloom-only read would
    // resurrect the base row)
    assert(Snapshot.readSnapshotPoint(spark, dest, 3, "105").count() == 0)
    // an inserted key is found in the upsert log
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 3, "1000")) ===
      Seq(Seq(1000L, "NEW")))
    // an untouched key still reads straight off its base file
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, 3, "50")) ===
      Seq(Seq(50L, "n50")))
    assert(Snapshot.readSnapshotPoint(spark, dest, 3, "5000").count() == 0)
    // the staged upsert/delete lines carry their own ROW COUNT and
    // words (path\trows\twords) — the count keeps #rows/compaction
    // sizing alive through the MoR lifecycle
    val l3 = Snapshot.manifestLines(spark, dest, 3)
    def rowsWords(l: String): Boolean = {
      val f = l.split("\t")
      f.length == 3 && f(1).forall(_.isDigit) && f(2).contains(",")
    }
    assert(l3.filter(_.startsWith("!")).forall(rowsWords))
    assert(l3.exists(l => l.startsWith("data/") && rowsWords(l)))
    // full reads resolve identically with the decorated lines
    assert(Snapshot.readSnapshot(spark, dest, 3).count() == 400)
    assert(rows(Snapshot.readSnapshot(spark, dest, 3)
      .filter(col("k").isin(100L, 105L, 1000L)).orderBy("k")) ===
      Seq(Seq(100L, "X"), Seq(1000L, "NEW")))
    // a non-key bloom column refuses MoR (carried words would lie)
    val dest2 = java.nio.file.Files.createTempDirectory("graft-morb2").toString
    Snapshot.publishSnapshotIndexed(kv(1L -> "a"), dest2, Nil, "v")
    intercept[IllegalArgumentException] {
      Snapshot.mergeSnapshotMoR(kv(1L -> "b"), dest2, "k")
    }
    // reconcile converts back to copy-on-write WITH the index intact:
    // untouched base files keep their words, the rewritten delta gets
    // fresh ones, and point reads keep working with zero tombstones
    val vR = Snapshot.reconcileSnapshotMoR(spark, dest)
    assert(Snapshot.readSnapshot(spark, dest, vR).count() == 400)
    assert(rows(Snapshot.readSnapshot(spark, dest, vR)
      .filter(col("k") === 100L)) === Seq(Seq(100L, "X")))
    assert(!Snapshot.manifestLines(spark, dest, vR).exists(_.startsWith("!")))
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, vR, "100")) ===
      Seq(Seq(100L, "X")))
    assert(Snapshot.readSnapshotPoint(spark, dest, vR, "105").count() == 0)
    assert(rows(Snapshot.readSnapshotPoint(spark, dest, vR, "1000")) ===
      Seq(Seq(1000L, "NEW")))
    // and the reconciled index PRUNES: a probe admits fewer lines than
    // the manifest holds
    assert(Snapshot.filesForKey(spark, dest, vR, "50").size <
      Snapshot.manifestLines(spark, dest, vR).size)
    ()
  }

  test("randomized indexed-MoR sequences: point read == model for every key, every version") {
    Seq(7L, 404L, 9090L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val dest = java.nio.file.Files
        .createTempDirectory(s"graft-morbp-$seed").toString
      var table = (0L until 40L).map(k => k -> s"n$k").toMap
      def toDf(m: Map[Long, String]) =
        m.toSeq.sortBy(_._1).toDF("k", "v").coalesce(2)
      Snapshot.publishSnapshotIndexed(
        toDf(table).repartitionByRange(4, col("k")), dest, Seq("k"), "k")
      var nextKey = 100L
      val ops = scala.collection.mutable.ListBuffer.empty[String]
      (1 to 6).foreach { step =>
        rnd.nextInt(4) match {
          case 0 => // merge: update random subset + fresh insert
            val upd = table.keySet.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(3)
              .map(k => k -> s"u$k").toMap
            nextKey += 1
            val ins = Map(nextKey -> s"i$nextKey")
            table = table ++ upd ++ ins
            Snapshot.mergeSnapshotMoR(toDf(upd ++ ins), dest, "k")
            ops += "merge"
          case 1 => // keyed delete of a random subset
            val del = table.keySet.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(2)
            if (del.nonEmpty) {
              table = table -- del
              Snapshot.deleteSnapshotMoR(del.toDF("k"), dest, "k")
              ops += s"del(${del.size})"
            }
          case 2 => // re-insert a previously deleted key (resurrection)
            val k = rnd.nextInt(40).toLong
            table = table + (k -> s"r$k")
            Snapshot.mergeSnapshotMoR(toDf(Map(k -> s"r$k")), dest, "k")
            ops += s"reins($k)"
          case 3 => // reconcile (index-preserving)
            Snapshot.reconcileSnapshotMoR(spark, dest)
            ops += "reconcile"
        }
        val v = Snapshot.latestVersion(spark, dest)
        val ctx = s"seed=$seed v=$v ops=${ops.mkString(",")}"
        def check(keys: Seq[Long]): Unit = keys.foreach { k =>
          val got = rows(Snapshot.readSnapshotPoint(spark, dest, v,
            k.toString)).map(r => r.head.asInstanceOf[Long] ->
            r(1).asInstanceOf[String]).toMap
          val want = table.get(k).map(k -> _).toMap
          assert(got == want, s"point($k): got $got want $want [$ctx]")
        }
        // mid-sequence: a random live sample + absent probes
        val live = table.keySet.toSeq.sorted
        check(rnd.shuffle(live).take(5) ++ Seq(-1L, 999L) ++
          (0L until 40L).filterNot(table.contains).take(2))
        // after the final op: EVERY key
        if (step == 6) check(live)
      }
    }
  }

  test("a racing commit aborts the MoR merge losslessly") {
    val dest = java.nio.file.Files.createTempDirectory("graft-morx").toString
    Snapshot.publishSnapshot(kv(1L -> "a"), dest)
    // simulate the race: another writer commits between our base read
    // and commit — easiest deterministic form: two sequential MoR
    // merges where the second is built against a stale base via the
    // concurrency soak pattern (threads), asserting one of each racing
    // pair aborts and the surviving history is lossless
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (0 until 2).map { i =>
      new Thread(() => {
        (0 until 3).foreach { j =>
          var done = false
          while (!done) {
            try {
              Snapshot.mergeSnapshotMoR(
                kv((10L * i + j) -> s"t$i$j"), dest, "k")
              done = true
            } catch {
              case _: Snapshot.ConcurrentSnapshotUpdate =>
                errs.incrementAndGet() // retry against the fresh base
            }
          }
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    // 6 merges committed → 7 contiguous versions, no delta lost
    assert(Snapshot.latestVersion(spark, dest) == 7)
    val got = rows(Snapshot.readSnapshot(spark, dest, 7).orderBy("k"))
      .map(_.head.asInstanceOf[Long]).toSet
    assert(got === Set(1L, 0L, 10L, 11L, 12L, 2L),
      s"lost a racing merge's delta: $got (aborts seen: ${errs.get})")
    ()
  }
}
