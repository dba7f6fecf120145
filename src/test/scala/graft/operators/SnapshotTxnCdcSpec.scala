package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Transaction-consistent CDC (SnapshotTxnCdc): per-txn windows hand
  * every enrolled table's change events together, so an applier's
  * derived state always equals a txn-consistent snapshot — never half
  * a transaction — and crash replay is verbatim.
  */
class SnapshotTxnCdcSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def kv(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  /** Replay a table's change events (ordered by commit version) into a
    * driver-side map — the reference applier. */
  private def apply1(state: scala.collection.mutable.Map[Long, String],
                     df: org.apache.spark.sql.DataFrame): Unit =
    df.orderBy("_commit_version").collect().foreach { r =>
      val k = r.getLong(r.fieldIndex("k"))
      r.getString(r.fieldIndex("_change_type")) match {
        case "delete" => state.remove(k); ()
        case _ => state(k) = r.getString(r.fieldIndex("v"))
      }
    }

  test("per-txn windows: applier state == asOfTxn snapshot after every window; replay verbatim") {
    val root = tmp("graft-tcdc"); val ckp = tmp("graft-tcdc-c")
    val a = tmp("graft-tcdc-a"); val b = tmp("graft-tcdc-b")
    Snapshot.publishSnapshot(kv(1L -> "a1"), a)
    Snapshot.publishSnapshot(kv(1L -> "b1"), b)
    // txn1: appends to both; txn2: MoR upsert on A + append on B;
    // txn3: MoR keyed delete on A alone
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stageAppend(kv(2L -> "a2"), a); t1.stageAppend(kv(2L -> "b2"), b)
    t1.commit()
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageMerge(kv(1L -> "A1x", 3L -> "a3"), a, "k")
    t2.stageAppend(kv(3L -> "b3"), b)
    t2.commit()
    val t3 = SnapshotTxn.begin(spark, root)
    t3.stageDelete(Seq(2L).toDF("k"), a, "k")
    t3.stageAppend(kv(4L -> "b4"), b)
    t3.commitNoFinalize() // crashed committer: CDC must still see it
    val sa = scala.collection.mutable.Map.empty[Long, String]
    val sb = scala.collection.mutable.Map.empty[Long, String]
    val seen = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    val n = SnapshotTxnCdc.pump(spark, root, ckp, maxTxnsPerBatch = 1) {
      d =>
        seen += ((d.fromTxn, d.toTxn))
        d.tables.get(a).foreach(apply1(sa, _))
        d.tables.get(b).foreach(apply1(sb, _))
        // CONSISTENCY: after each window the applier equals the
        // txn-consistent snapshot of BOTH tables — never half a txn
        val vs = SnapshotTxn.asOfTxn(spark, root, d.toTxn)
        def snap(t: String) = Snapshot.readSnapshot(spark, t, vs(t))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(sa.toMap === snap(a), s"A diverged at txn ${d.toTxn}")
        assert(sb.toMap === snap(b), s"B diverged at txn ${d.toTxn}")
    }
    assert(n == 3 && seen.toList === List((0, 1), (1, 2), (2, 3)))
    assert(sa.toMap === Map(1L -> "A1x", 3L -> "a3"))
    assert(sb.toMap ===
      Map(1L -> "b1", 2L -> "b2", 3L -> "b3", 4L -> "b4"))
    // nothing new: no windows
    assert(SnapshotTxnCdc.pump(spark, root, ckp)(_ =>
      fail("no new txns")) == 0)
    // REPLAY: rewind the watermark to 1 (crash after window 1's
    // advance) — windows 2 and 3 replay verbatim, applier converges to
    // the same state
    val fs = new org.apache.hadoop.fs.Path(ckp).getFileSystem(
      spark.sessionState.newHadoopConf())
    Snapshot.writeFileAtomic(fs, s"$ckp/applied-txn",
      s"$ckp/.applied-txn.tmp", Seq("1"))
    sa.clear(); sb.clear()
    sa ++= Map(1L -> "a1", 2L -> "a2"); sb ++= Map(1L -> "b1", 2L -> "b2")
    assert(SnapshotTxnCdc.pump(spark, root, ckp, maxTxnsPerBatch = 1) {
      d =>
        d.tables.get(a).foreach(apply1(sa, _))
        d.tables.get(b).foreach(apply1(sb, _))
    } == 2)
    assert(sa.toMap === Map(1L -> "A1x", 3L -> "a3"))
    assert(sb.toMap ===
      Map(1L -> "b1", 2L -> "b2", 3L -> "b3", 4L -> "b4"))
    ()
  }

  test("pump survives txn-log pruning (checkpoint snapshot); windows stay correct") {
    val root = tmp("graft-tcdcp"); val ckp = tmp("graft-tcdcp-c")
    val a = tmp("graft-tcdcp-a")
    Snapshot.publishSnapshot(kv(1L -> "a1"), a)
    (2 to 4).foreach { i =>
      val t = SnapshotTxn.begin(spark, root)
      t.stageAppend(kv(i.toLong -> s"a$i"), a); t.commit()
    }
    val sa = scala.collection.mutable.Map.empty[Long, String]
    assert(SnapshotTxnCdc.pump(spark, root, ckp) { d =>
      d.tables.get(a).foreach(apply1(sa, _))
    } == 1)
    assert(SnapshotTxnCdc.appliedTxn(spark, ckp) == 3)
    // PRUNE the consumed prefix (the head manifest always survives —
    // it carries the streaming replay tag): before the checkpoint
    // cached the (table → version) snapshot, every later pump refolded
    // from txn 1 and hard-failed right here
    assert(SnapshotTxn.vacuumTxnLog(spark, root, keepFrom = 4) == 2)
    val t5 = SnapshotTxn.begin(spark, root)
    t5.stageMerge(kv(1L -> "A1x"), a, "k"); t5.commit()
    val t6 = SnapshotTxn.begin(spark, root)
    t6.stageDelete(Seq(3L).toDF("k"), a, "k"); t6.commit()
    assert(SnapshotTxnCdc.pump(spark, root, ckp, maxTxnsPerBatch = 1) {
      d => d.tables.get(a).foreach(apply1(sa, _))
    } == 2)
    assert(sa.toMap === Map(1L -> "A1x", 2L -> "a2", 4L -> "a4"))
    // and the applier still equals the txn-pinned snapshot
    val vs = SnapshotTxn.asOfTxn(spark, root, 5)
    assert(Snapshot.readSnapshot(spark, a, vs(a)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap === sa.toMap)
    ()
  }

  test("COLD consumer on a pruned log bootstraps via the vacuum fold snapshot") {
    val root = tmp("graft-tcdcb"); val a = tmp("graft-tcdcb-a")
    Snapshot.publishSnapshot(kv(1L -> "a1"), a)
    (2 to 3).foreach { i =>
      val t = SnapshotTxn.begin(spark, root)
      t.stageAppend(kv(i.toLong -> s"a$i"), a); t.commit()
    }
    assert(SnapshotTxn.vacuumTxnLog(spark, root, keepFrom = 3) == 1)
    val t3 = SnapshotTxn.begin(spark, root)
    t3.stageAppend(kv(4L -> "a4"), a); t3.commit()
    // fresh checkpoint: the bootstrap fold starts from the vacuum's
    // snapshot, so the pruned prefix never blocks a brand-new consumer
    val ckp = tmp("graft-tcdcb-c")
    val sa = scala.collection.mutable.Map.empty[Long, String]
    assert(SnapshotTxnCdc.pump(spark, root, ckp) { d =>
      assert(d.fromTxn == 0 && d.toTxn == 3)
      d.tables.get(a).foreach(apply1(sa, _))
    } == 1)
    assert(sa.toMap ===
      Map(1L -> "a1", 2L -> "a2", 3L -> "a3", 4L -> "a4"))
    ()
  }

  test("legacy one-line checkpoint (no snapshot) upgrades on the next pump") {
    val root = tmp("graft-tcdcl"); val ckp = tmp("graft-tcdcl-c")
    val a = tmp("graft-tcdcl-a")
    Snapshot.publishSnapshot(kv(1L -> "a1"), a)
    (2 to 3).foreach { i =>
      val t = SnapshotTxn.begin(spark, root)
      t.stageAppend(kv(i.toLong -> s"a$i"), a); t.commit()
    }
    // a pre-snapshot checkpoint: watermark only
    val fs = new org.apache.hadoop.fs.Path(ckp).getFileSystem(
      spark.sessionState.newHadoopConf())
    Snapshot.writeFileAtomic(fs, s"$ckp/applied-txn",
      s"$ckp/.applied-txn.tmp", Seq("1"))
    val sa = scala.collection.mutable.Map.empty[Long, String]
    sa ++= Map(1L -> "a1", 2L -> "a2") // state as of txn 1
    assert(SnapshotTxnCdc.pump(spark, root, ckp) { d =>
      assert(d.fromTxn == 1 && d.toTxn == 2)
      d.tables.get(a).foreach(apply1(sa, _))
    } == 1)
    assert(sa.toMap === Map(1L -> "a1", 2L -> "a2", 3L -> "a3"))
    // the checkpoint now carries the snapshot beside the watermark
    val lines = Snapshot.readTextLines(fs, s"$ckp/applied-txn")
    assert(lines.head.trim == "2" && lines.tail.nonEmpty)
    ()
  }

  test("soak: a pumping consumer races two transactional writers; every txn lands exactly once") {
    import java.util.concurrent.{Callable, Executors, TimeUnit}
    val root = tmp("graft-tcdcs"); val ckp = tmp("graft-tcdcs-c")
    val a = tmp("graft-tcdcs-a"); val b = tmp("graft-tcdcs-b")
    Snapshot.publishSnapshot(kv(0L -> "a0"), a)
    Snapshot.publishSnapshot(kv(0L -> "b0"), b)
    val pool = Executors.newFixedThreadPool(3)
    val sa = scala.collection.mutable.Map.empty[Long, String]
    val sb = scala.collection.mutable.Map.empty[Long, String]
    val windows = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      val writers = (1 to 2).map { w =>
        pool.submit(new Callable[Unit] {
          def call(): Unit = (0 until 5).foreach { i =>
            val key = 100L * w + i
            var done = false
            while (!done) {
              val t = SnapshotTxn.begin(spark, root)
              try {
                t.stageAppend(kv(key -> s"a-$key"), a)
                t.stageAppend(kv(key -> s"b-$key"), b)
                // odd txns die right after the commit point: the
                // consumer's bundled recovery must roll them forward
                if (i % 2 == 1) t.commitNoFinalize() else t.commit()
                done = true
              } catch {
                case _: Snapshot.ConcurrentSnapshotUpdate => // restage
              }
            }
          }
        })
      }
      val consumer = pool.submit(new Callable[Unit] {
        def call(): Unit = (0 until 40).foreach { _ =>
          windows.addAndGet(
            SnapshotTxnCdc.pump(spark, root, ckp, maxTxnsPerBatch = 1) {
              d =>
                d.tables.get(a).foreach(apply1(sa, _))
                d.tables.get(b).foreach(apply1(sb, _))
            })
          Thread.sleep(20)
        }
      })
      (writers :+ consumer).foreach(_.get(300, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    // drain whatever the consumer's last poll missed
    SnapshotTxnCdc.pump(spark, root, ckp, maxTxnsPerBatch = 1) { d =>
      d.tables.get(a).foreach(apply1(sa, _))
      d.tables.get(b).foreach(apply1(sb, _))
    }
    val want = (1 to 2).flatMap(w => (0 until 5).map(i => 100L * w + i))
    assert(sa.toMap === (want.map(k => k -> s"a-$k").toMap + (0L -> "a0")))
    assert(sb.toMap === (want.map(k => k -> s"b-$k").toMap + (0L -> "b0")))
    // exactly one window per committed txn, all 10 txns consumed
    assert(SnapshotTxnCdc.appliedTxn(spark, ckp) == 10)
    ()
  }

  test("late-enrolled table bootstraps as full-state inserts; untouched tables absent") {
    val root = tmp("graft-tcdc2"); val ckp = tmp("graft-tcdc2-c")
    val a = tmp("graft-tcdc2-a"); val c = tmp("graft-tcdc2-c2")
    Snapshot.publishSnapshot(kv(1L -> "a1"), a)
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stageAppend(kv(2L -> "a2"), a); t1.commit()
    // consumer catches up through txn 1
    assert(SnapshotTxnCdc.pump(spark, root, ckp)(_ => ()) == 1)
    // table C existed all along but enrolls only in txn 2
    Snapshot.publishSnapshot(kv(7L -> "c-pre"), c)
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageAppend(kv(8L -> "c8"), c); t2.commit()
    var got: Option[SnapshotTxnCdc.TxnDelta] = None
    assert(SnapshotTxnCdc.pump(spark, root, ckp) { d => got = Some(d) } == 1)
    val d = got.get
    // A did not move in txn 2: absent from the delta
    assert(!d.tables.contains(a))
    // C bootstraps with its FULL state (pre-txn rows included)
    val ev = d.tables(c).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(r.fieldIndex("_change_type")))).toSet
    assert(ev === Set((7L, "c-pre", "insert"), (8L, "c8", "insert")))
    ()
  }
}
