package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Txn-consistent joined materialized view
  * (MaterializedView.refreshTxnJoinView): a samples⋈datasets rollup
  * maintained from the TRANSACTION log, so the view can never hold
  * half a registration; crash-replay converges via the txn tag; the
  * append-only datasets contract refuses loudly.
  */
class TxnJoinViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def samplesDf(rows: (Long, String)*) = rows.toSeq.toDF("sid", "name")
  private def datasetsDf(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("did", "sid", "cents")

  /** The view's oracle: full recompute from the live tables. */
  private def full(sDir: String, dDir: String): Seq[Seq[Any]] = {
    val s = Snapshot.readSnapshot(spark, sDir,
      Snapshot.latestVersion(spark, sDir))
    val d = Snapshot.readSnapshot(spark, dDir,
      Snapshot.latestVersion(spark, dDir))
    rows(s.join(d.groupBy("sid").agg(count(lit(1)).as("n_ds"),
        sum(col("cents")).as("total")), Seq("sid"), "left")
      .select(col("sid"), col("name"),
        coalesce(col("n_ds"), lit(0L)).as("n_ds"),
        coalesce(col("total"), lit(0L)).as("total"))
      .orderBy("sid"))
  }

  private def viewRows(mv: String): Seq[Seq[Any]] =
    rows(Snapshot.readSnapshot(spark, mv,
      Snapshot.latestVersion(spark, mv)).orderBy("sid"))

  test("bootstrap + incremental windows == full recompute; deletes and upserts land atomically") {
    val out = tmp("graft-tjv")
    val (root, sDir, dDir, mv, ckp) =
      (s"$out/root", s"$out/s", s"$out/d", s"$out/mv", s"$out/ckp")
    // txn1: the initial registration — both tables born in one txn
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(samplesDf(1L -> "s1", 2L -> "s2", 3L -> "s3"), sDir)
    t1.stagePublish(datasetsDf((10L, 1L, 100L), (11L, 1L, 50L),
      (12L, 2L, 30L)), dDir)
    t1.commit()
    // window 1 bootstraps the view from the txn-pinned state
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents",
      maxTxnsPerBatch = 1) == 1)
    assert(viewRows(mv) === Seq(
      Seq(1L, "s1", 2L, 150L), Seq(2L, "s2", 1L, 30L),
      Seq(3L, "s3", 0L, 0L)))
    // txn2: upsert a sample + register datasets for it and a NEW sample
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageMerge(samplesDf(1L -> "s1x", 4L -> "s4"), sDir, "sid")
    t2.stageAppend(datasetsDf((13L, 1L, 5L), (14L, 4L, 70L)), dDir)
    t2.commit()
    // txn3: delete a sample + one more dataset for an untouched sample
    val t3 = SnapshotTxn.begin(spark, root)
    t3.stageDelete(Seq(2L).toDF("sid"), sDir, "sid")
    t3.stageAppend(datasetsDf((15L, 3L, 9L)), dDir)
    t3.commitNoFinalize() // and the committer dies after the commit point
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents",
      maxTxnsPerBatch = 1) == 2)
    assert(viewRows(mv) === Seq(
      Seq(1L, "s1x", 3L, 155L), Seq(3L, "s3", 1L, 9L),
      Seq(4L, "s4", 1L, 70L)))
    assert(viewRows(mv) === full(sDir, dDir))
    // nothing new: no windows, no view commits
    val mvV = Snapshot.latestVersion(spark, mv)
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents") == 0)
    assert(Snapshot.latestVersion(spark, mv) == mvV)
    ()
  }

  test("mid-pump crash between view commit and watermark: the replayed window tag-skips") {
    val out = tmp("graft-tjv2")
    val (root, sDir, dDir, mv, ckp) =
      (s"$out/root", s"$out/s", s"$out/d", s"$out/mv", s"$out/ckp")
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(samplesDf(1L -> "s1", 2L -> "s2"), sDir)
    t1.stagePublish(datasetsDf((10L, 1L, 100L)), dDir)
    t1.commit()
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageMerge(samplesDf(2L -> "s2x"), sDir, "sid")
    t2.stageAppend(datasetsDf((11L, 2L, 40L)), dDir)
    t2.commit()
    // crash INJECTED after window 2's view commit, before its watermark
    // advance: the next pump replays window 2 verbatim
    var applied = 0
    intercept[RuntimeException] {
      SnapshotTxnCdc.pump(spark, root, ckp, maxTxnsPerBatch = 1) { d =>
        MaterializedView.applyTxnJoinWindow(spark, d, sDir, dDir, mv,
          "sid", Seq("name"), "sid", "cents")
        applied += 1
        if (d.toTxn == 2)
          throw new RuntimeException("injected crash before advance")
      }
    }
    assert(applied == 2)
    assert(SnapshotTxnCdc.appliedTxn(spark, ckp) == 1) // watermark behind
    val mvAfterCrash = Snapshot.latestVersion(spark, mv)
    // replay: window 2 re-delivered, the view's txn2 tag skips the
    // double-apply, the watermark catches up
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents",
      maxTxnsPerBatch = 1) == 1)
    assert(Snapshot.latestVersion(spark, mv) == mvAfterCrash)
    assert(SnapshotTxnCdc.appliedTxn(spark, ckp) == 2)
    assert(viewRows(mv) === Seq(
      Seq(1L, "s1", 1L, 100L), Seq(2L, "s2x", 1L, 40L)))
    assert(viewRows(mv) === full(sDir, dDir))
    ()
  }

  test("base-table maintenance mid-stream: the view auto-rebootstraps instead of wedging") {
    val out = tmp("graft-tjv4")
    val (root, sDir, dDir, mv, ckp) =
      (s"$out/root", s"$out/s", s"$out/d", s"$out/mv", s"$out/ckp")
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(samplesDf(1L -> "s1", 2L -> "s2", 3L -> "s3"), sDir)
    t1.stagePublish(datasetsDf((10L, 1L, 100L), (11L, 3L, 50L)), dDir)
    t1.commit()
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents") == 1)
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageMerge(samplesDf(1L -> "s1x"), sDir, "sid")
    t2.commit()
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents") == 1)
    // routine maintenance rewrites the samples table OUTSIDE the log
    // (reconcile removes manifest lines — the class that used to wedge
    // every later window with changeFeed's re-bootstrap refusal)
    Snapshot.reconcileSnapshotMoR(spark, sDir)
    val t3 = SnapshotTxn.begin(spark, root)
    t3.stageDelete(Seq(3L).toDF("sid"), sDir, "sid")
    t3.stageAppend(datasetsDf((12L, 2L, 7L)), dDir)
    t3.commit()
    // the DEFAULT contract still refuses loudly across the rewrite
    val applied = SnapshotTxnCdc.appliedTxn(spark, ckp)
    intercept[IllegalArgumentException] {
      SnapshotTxnCdc.changesSince(spark, root, applied)
        .get.tables.values.foreach(_.queryExecution.toRdd.count())
    }
    // the view's consumer opts into auto-rebootstrap: the window
    // degrades to full-state inserts for samples and the applier
    // reconciles stale view keys (sid 3 deleted INSIDE the rewrite
    // window must leave the view by ABSENCE, not by a delete event)
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents") == 1)
    assert(viewRows(mv) === Seq(
      Seq(1L, "s1x", 1L, 100L), Seq(2L, "s2", 1L, 7L)))
    assert(viewRows(mv) === full(sDir, dDir))
    // and the delta names the rebootstrapped table
    var boot: Set[String] = Set.empty
    val t4 = SnapshotTxn.begin(spark, root)
    t4.stageMerge(samplesDf(2L -> "s2x"), sDir, "sid")
    t4.commit()
    SnapshotTxnCdc.pump(spark, root, ckp,
        rebootstrapOnRewrite = true) { d => boot = d.bootstrapped }
    assert(boot.isEmpty) // no rewrite this window: a true delta again
    ()
  }

  test("dataset mutations folded into a rewrite window resolve via full-group recompute") {
    val out = tmp("graft-tjv5")
    val (root, sDir, dDir, mv, ckp) =
      (s"$out/root", s"$out/s", s"$out/d", s"$out/mv", s"$out/ckp")
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(samplesDf(1L -> "s1", 2L -> "s2"), sDir)
    t1.stagePublish(datasetsDf((10L, 1L, 100L), (11L, 2L, 40L)), dDir)
    t1.commit()
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents") == 1)
    // a dataset DELETE (normally refused) and a rewrite land inside the
    // same consumer window: txn2 tombstones did=10, the table is then
    // reconciled (rewrite), txn3 appends — the window's feed rebootstraps
    // to the full post-delete state, and the view recomputes EVERY
    // group from it, so sid 1's vanished dataset zeroes out instead of
    // lingering as a stale rollup
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageDelete(Seq(10L).toDF("did"), dDir, "did")
    t2.commit()
    Snapshot.reconcileSnapshotMoR(spark, dDir)
    val t3 = SnapshotTxn.begin(spark, root)
    t3.stageAppend(datasetsDf((12L, 2L, 7L)), dDir)
    t3.commit()
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents") == 1)
    assert(viewRows(mv) === Seq(
      Seq(1L, "s1", 0L, 0L), Seq(2L, "s2", 2L, 47L)))
    assert(viewRows(mv) === full(sDir, dDir))
    ()
  }

  test("append-only datasets contract: a dataset delete event refuses loudly") {
    val out = tmp("graft-tjv3")
    val (root, sDir, dDir, mv, ckp) =
      (s"$out/root", s"$out/s", s"$out/d", s"$out/mv", s"$out/ckp")
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(samplesDf(1L -> "s1"), sDir)
    t1.stagePublish(datasetsDf((10L, 1L, 100L)), dDir)
    t1.commit()
    assert(MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
      mv, ckp, "sid", Seq("name"), "sid", "cents") == 1)
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageDelete(Seq(10L).toDF("did"), dDir, "did")
    t2.commit()
    val e = intercept[Exception] {
      MaterializedView.refreshTxnJoinView(spark, root, sDir, dDir,
        mv, ckp, "sid", Seq("name"), "sid", "cents")
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(t => t.getMessage != null &&
      t.getMessage.contains("append-only")), e.toString)
    ()
  }

  test("generalized TxnViewSpec: vocabulary decode + custom aggregates, incremental == full recompute") {
    import MaterializedView.{TxnViewAgg, TxnViewDim, TxnViewSpec}
    val out = tmp("graft-tjv5")
    val (root, sDir, dDir, mv, ckp) =
      (s"$out/root", s"$out/s", s"$out/d", s"$out/mv", s"$out/ckp")
    // samples carry a vocabulary CODE; the dim decodes it to a label
    def sdf(rows: (Long, Long)*) = rows.toSeq.toDF("sid", "code")
    val vocab = Seq((1L, "rna"), (2L, "dna")).toDF("code", "label")
    val spec = TxnViewSpec("sid", Seq("code"), "sid",
      Seq(TxnViewAgg("n_ds", count(lit(1)), lit(0L)),
        TxnViewAgg("mx", max(col("cents")), lit(0L)),
        TxnViewAgg("total", sum(col("cents")), lit(0L))),
      Seq(TxnViewDim(vocab, "code", Seq("label"))))
    def refresh() = MaterializedView.refreshTxnView(spark, root, sDir,
      dDir, mv, ckp, spec, maxTxnsPerBatch = 1)
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(sdf(1L -> 1L, 2L -> 2L, 3L -> 9L), sDir)
    t1.stagePublish(datasetsDf((10L, 1L, 100L), (11L, 1L, 50L),
      (12L, 2L, 30L)), dDir)
    t1.commit()
    assert(refresh() == 1)
    // decoded label rides the view; unknown codes null-fill (left join);
    // custom max + the defaults for no-dataset samples
    assert(viewRows(mv) === Seq(
      Seq(1L, 1L, "rna", 2L, 100L, 150L),
      Seq(2L, 2L, "dna", 1L, 30L, 30L),
      Seq(3L, 9L, null, 0L, 0L, 0L)))
    // incremental window: sample upsert (code change!) + datasets + a
    // sample delete, one txn — the decode recomputes with the group
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageMerge(sdf(1L -> 2L, 4L -> 1L), sDir, "sid")
    t2.stageAppend(datasetsDf((13L, 4L, 70L), (14L, 1L, 200L)), dDir)
    t2.commit()
    val t3 = SnapshotTxn.begin(spark, root)
    t3.stageDelete(Seq(2L).toDF("sid"), sDir, "sid")
    t3.commit()
    assert(refresh() == 2)
    assert(viewRows(mv) === Seq(
      Seq(1L, 2L, "dna", 3L, 200L, 350L),
      Seq(3L, 9L, null, 0L, 0L, 0L),
      Seq(4L, 1L, "rna", 1L, 70L, 70L)))
    // replay of an applied feed: no windows, no commits
    val mvV = Snapshot.latestVersion(spark, mv)
    assert(refresh() == 0)
    assert(Snapshot.latestVersion(spark, mv) == mvV)
    // a dim joinCol outside the projected sample columns refuses
    intercept[IllegalArgumentException] {
      TxnViewSpec("sid", Seq("code"), "sid",
        Seq(TxnViewAgg("n_ds", count(lit(1)), lit(0L))),
        Seq(TxnViewDim(vocab, "nope", Seq("label"))))
    }
    ()
  }

  test("chained dims (n-ary): sample -> parent -> vocabulary, incremental windows stay exact") {
    // The reference report's three-level shape: samples carry a PARENT
    // id; dim 1 joins the parent table and PRODUCES the parent's code;
    // dim 2 decodes that produced code. dims chain in order.
    import MaterializedView.{TxnViewAgg, TxnViewDim, TxnViewSpec}
    val out = tmp("graft-tjv6")
    val (root, sDir, dDir, mv, ckp) =
      (s"$out/root", s"$out/s", s"$out/d", s"$out/mv", s"$out/ckp")
    def sdf(rows: (Long, Long)*) = rows.toSeq.toDF("sid", "pid")
    val parent = Seq((100L, 1L), (200L, 2L)).toDF("pid", "pcode")
    val vocab = Seq((1L, "tissue"), (2L, "blood")).toDF("pcode", "plabel")
    val spec = TxnViewSpec("sid", Seq("pid"), "sid",
      Seq(TxnViewAgg("n_ds", count(lit(1)), lit(0L)),
        TxnViewAgg("total", sum(col("cents")), lit(0L))),
      Seq(TxnViewDim(parent, "pid", Seq("pcode")),
        TxnViewDim(vocab, "pcode", Seq("plabel"))))
    def refresh() = MaterializedView.refreshTxnView(spark, root, sDir,
      dDir, mv, ckp, spec, maxTxnsPerBatch = 1)
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(sdf(1L -> 100L, 2L -> 200L, 3L -> 999L), sDir)
    t1.stagePublish(datasetsDf((10L, 1L, 100L), (11L, 2L, 30L)), dDir)
    t1.commit()
    assert(refresh() == 1)
    // the chain decoded BOTH levels; unknown parent null-fills through
    assert(viewRows(mv) === Seq(
      Seq(1L, 100L, 1L, "tissue", 1L, 100L),
      Seq(2L, 200L, 2L, "blood", 1L, 30L),
      Seq(3L, 999L, null, null, 0L, 0L)))
    // incremental: a sample MOVES parent (the chain recomputes), plus
    // new datasets — one txn
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageMerge(sdf(1L -> 200L), sDir, "sid")
    t2.stageAppend(datasetsDf((12L, 1L, 70L)), dDir)
    t2.commit()
    assert(refresh() == 1)
    assert(viewRows(mv) === Seq(
      Seq(1L, 200L, 2L, "blood", 2L, 170L),
      Seq(2L, 200L, 2L, "blood", 1L, 30L),
      Seq(3L, 999L, null, null, 0L, 0L)))
    // chain order is validated: a dim joining on a column produced by
    // a LATER dim refuses at construction
    val e = intercept[IllegalArgumentException] {
      TxnViewSpec("sid", Seq("pid"), "sid",
        Seq(TxnViewAgg("n_ds", count(lit(1)), lit(0L))),
        Seq(TxnViewDim(vocab, "pcode", Seq("plabel")),
          TxnViewDim(parent, "pid", Seq("pcode"))))
    }
    assert(e.getMessage.contains("EARLIER dim"), e.getMessage)
    ()
  }
}
