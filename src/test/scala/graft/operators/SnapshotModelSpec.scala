package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based randomized exercise of the snapshot layout: a seeded
  * random sequence of publish / append / merge / compact / vacuum /
  * range-replace / MoR-merge / MoR-delete / reconcile /
  * predicate-delete / predicate-update runs
  * against BOTH the real layout and a driver-side model (a key→value
  * map per version), and every committed version must read back equal
  * to its model snapshot — including after later operations. This is
  * the subsystem-level complement to the per-operation specs: it
  * exercises the INTERLEAVINGS (merge after compact, vacuum then
  * append, MoR chains crossing reconciles, stats carried across all
  * of them) that no single-op test pins. While the table is
  * TOMBSTONED, the op choice narrows to what the refusal walls allow
  * (publish / vacuum / MoR ops / reconcile) and the range-read check
  * pauses — mirroring the subsystem's own contract. Fixed seeds keep
  * it deterministic and replayable.
  */
class SnapshotModelSpec extends SparkSpec {
  import spark.implicits._

  private def toDf(m: Map[Long, String]) =
    m.toSeq.sortBy(_._1).toDF("k", "v").coalesce(2)

  private def readBack(dest: String, v: Int): Map[Long, String] =
    Snapshot.readSnapshot(spark, dest, v).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def runSequence(seed: Long, nOps: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val dest = java.nio.file.Files
      .createTempDirectory(s"graft-model-$seed").toString
    val txnRoot = java.nio.file.Files
      .createTempDirectory(s"graft-model-txn-$seed").toString
    var nextKey = 0L
    def freshRows(n: Int): Map[Long, String] = {
      val m = (0 until n).map { _ =>
        nextKey += 1; nextKey -> s"v$nextKey"
      }.toMap
      m
    }
    // model: committed version -> expected table state (absent = vacuumed)
    val model = scala.collection.mutable.Map.empty[Int, Map[Long, String]]
    var table = freshRows(3 + rnd.nextInt(3))
    Snapshot.publishSnapshot(toDf(table), dest, statsCol = Some("k"))
    model(1) = table
    var ops = List.empty[String]
    var tombstoned = false
    (1 to nOps).foreach { _ =>
      val latest = Snapshot.latestVersion(spark, dest)
      // a tombstoned table refuses COW mutations and range reads by
      // contract — only the MoR-compatible ops stay on the menu
      val op =
        if (tombstoned) Seq(0, 4, 6, 7, 8, 9, 10, 12, 13)(rnd.nextInt(9))
        else rnd.nextInt(14)
      // transactional ops route through the txn log; half the time the
      // committer "dies" at the commit point and the bundled recovery
      // repairs on the next touch — the model must never see the gap
      def txnLand(t: SnapshotTxn): Unit =
        if (rnd.nextBoolean()) { t.commit(); () }
        else { t.commitNoFinalize(); SnapshotTxn.recover(spark, txnRoot); () }
      op match {
        case 0 => // full replace (also the fresh-definition escape from MoR)
          table = freshRows(2 + rnd.nextInt(3))
          val v = Snapshot.publishSnapshot(toDf(table), dest,
            statsCol = Some("k"))
          tombstoned = false
          model(v) = table; ops ::= s"publish->v$v"
        case 1 => // append fresh keys
          val add = freshRows(1 + rnd.nextInt(3))
          table = table ++ add
          val v = Snapshot.appendSnapshot(toDf(add), dest,
            statsCol = Some("k"))
          model(v) = table; ops ::= s"append->v$v"
        case 2 => // merge: update a random existing subset + one insert
          val updated = table.keySet.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(3)
            .map(k => k -> s"u$k").toMap
          val ins = freshRows(1)
          table = table ++ updated ++ ins
          val v = Snapshot.mergeSnapshot(toDf(updated ++ ins), dest, "k")
          model(v) = table; ops ::= s"merge->v$v"
        case 3 => // compact (content-neutral; may be a no-op)
          val v = Snapshot.compactSnapshot(spark, dest, minRows = 3L,
            targetRows = 1000L)
          model(v) = table; ops ::= s"compact->v$v"
        case 4 => // vacuum to the latest version only
          Snapshot.vacuum(spark, dest, keepFrom = latest)
          (1 until latest).foreach(model.remove)
          ops ::= s"vacuum(keep=$latest)"
        case 5 => // range replace: a middle slice swapped for fresh rows
          val ks = table.keySet.toSeq.sorted
          val (lo, hi) =
            if (ks.size < 2) (ks.head, ks.head)
            else (ks(rnd.nextInt(ks.size / 2 + 1)),
              ks(ks.size / 2 + rnd.nextInt(ks.size - ks.size / 2)))
          val inside = (1 to (1 + rnd.nextInt(2))).map { _ =>
            val k = lo + rnd.nextInt((hi - lo + 1).toInt)
            k.toLong -> s"r$k"
          }.toMap
          table = table.filter { case (k, _) => k < lo || k > hi } ++ inside
          val v = Snapshot.replaceSnapshotRange(toDf(inside), dest, lo, hi)
          model(v) = table; ops ::= s"replace[$lo,$hi]->v$v"
        case 6 => // MoR merge: update a random subset + one insert, O(batch)
          val updated = table.keySet.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(3)
            .map(k => k -> s"m$k").toMap
          val ins = freshRows(1)
          table = table ++ updated ++ ins
          val v = Snapshot.mergeSnapshotMoR(toDf(updated ++ ins), dest, "k")
          tombstoned = true
          model(v) = table; ops ::= s"morMerge->v$v"
        case 7 => // MoR row-level delete of a random existing subset
          val del = table.keySet.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(2)
          table = table -- del
          val v = Snapshot.deleteSnapshotMoR(
            del.toDF("k"), dest, "k")
          tombstoned = true
          model(v) = table; ops ::= s"morDelete(${del.size})->v$v"
        case 8 => // reconcile back to copy-on-write (no-op when clean)
          val v = Snapshot.reconcileSnapshotMoR(spark, dest)
          tombstoned = false
          model(v) = table; ops ::= s"reconcile->v$v"
        case 9 => // predicate MoR DELETE over a random key range
          if (table.isEmpty) ops ::= "dwSkip"
          else {
            val ks = table.keySet.toSeq.sorted
            val lo = ks(rnd.nextInt(ks.size))
            val hi = lo + rnd.nextInt(5)
            table = table.filter { case (k, _) => k < lo || k > hi }
            val v = Snapshot.deleteSnapshotMoRWhere(spark, dest, "k",
              col("k") >= lo && col("k") <= hi)
            if (v > latest) tombstoned = true // matched: tombstones landed
            model(v) = table; ops ::= s"deleteWhere[$lo,$hi]->v$v"
          }
        case 10 => // predicate MoR UPDATE (self-referencing SET)
          if (table.isEmpty) ops ::= "uwSkip"
          else {
            val ks = table.keySet.toSeq.sorted
            val lo = ks(rnd.nextInt(ks.size))
            val hi = lo + rnd.nextInt(5)
            table = table.map { case (k, v0) =>
              k -> (if (k >= lo && k <= hi) v0 + "+" else v0) }
            val v = Snapshot.updateSnapshotMoRWhere(spark, dest, "k",
              col("k") >= lo && col("k") <= hi,
              Map("v" -> concat(col("v"), lit("+"))))
            if (v > latest) tombstoned = true
            model(v) = table; ops ::= s"updateWhere[$lo,$hi]->v$v"
          }
        case 11 => // transactional append (refused on tombstoned tables)
          val add = freshRows(1 + rnd.nextInt(2))
          table = table ++ add
          val t = SnapshotTxn.begin(spark, txnRoot)
          t.stageAppend(toDf(add), dest, statsCol = Some("k"))
          txnLand(t)
          val v = Snapshot.latestVersion(spark, dest)
          model(v) = table; ops ::= s"txnAppend->v$v"
        case 12 => // transactional MoR merge
          val updated = table.keySet.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(3)
            .map(k => k -> s"t$k").toMap
          val ins = freshRows(1)
          table = table ++ updated ++ ins
          val t = SnapshotTxn.begin(spark, txnRoot)
          t.stageMerge(toDf(updated ++ ins), dest, "k")
          txnLand(t)
          tombstoned = true
          val v = Snapshot.latestVersion(spark, dest)
          model(v) = table; ops ::= s"txnMerge->v$v"
        case 13 => // transactional keyed MoR delete
          val del = table.keySet.toSeq.sorted
            .filter(_ => rnd.nextBoolean()).take(2)
          if (del.isEmpty) ops ::= "txnDelSkip"
          else {
            table = table -- del
            val t = SnapshotTxn.begin(spark, txnRoot)
            t.stageDelete(del.toDF("k"), dest, "k")
            txnLand(t)
            tombstoned = true
            val v = Snapshot.latestVersion(spark, dest)
            model(v) = table; ops ::= s"txnDelete(${del.size})->v$v"
          }
      }
      val ctx = s"seed=$seed ops=${ops.reverse.mkString(",")}"
      // the LATEST version always equals the current model table
      assert(readBack(dest, Snapshot.latestVersion(spark, dest)) == table,
        s"latest mismatch [$ctx]")
      // range read on the stats column stays exact through every op
      // (refused-by-contract while tombstones exist)
      if (table.nonEmpty && !tombstoned) {
        val ks = table.keySet
        val (lo, hi) = (ks.min + 1, ks.max - 1)
        val got = Snapshot.readSnapshotRange(spark, dest,
            Snapshot.latestVersion(spark, dest), lo, hi)
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got == table.filter { case (k, _) => k >= lo && k <= hi },
          s"range mismatch [$ctx]")
      }
    }
    // TIME TRAVEL: every retained version still reads as its snapshot
    model.foreach { case (v, expect) =>
      assert(readBack(dest, v) == expect,
        s"version $v drifted [seed=$seed ops=${ops.reverse.mkString(",")}]")
    }
  }

  test("random op sequences: every retained version equals its model") {
    Seq(11L, 42L, 1303L, 7707L).foreach(runSequence(_, nOps = 10))
  }
}
