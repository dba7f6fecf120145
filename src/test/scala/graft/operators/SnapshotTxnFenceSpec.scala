package graft.operators

import graft.SparkSpec

/** TWO REAL JVMs on one transaction log — the cross-process writer
  * fencing rehearsal (the r14 verdict's "prove it or refuse it"). The
  * in-process fencing tests simulate the second driver by editing the
  * writer file; this spec spawns an actual second JVM
  * ([[FenceProbeMain]]) and proves the protocol across a genuine
  * process boundary:
  *
  *   1. a second driver's commit REFUSES (fenced) while this JVM holds
  *      the epoch — no interleaving with this driver's commit path is
  *      reachable;
  *   2. after the second driver's explicit claimWriter takeover its
  *      commit LANDS, and THIS driver — the fenced zombie — refuses at
  *      its own next commit point.
  */
class SnapshotTxnFenceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  private def kv(rows: (Long, String)*) = rows.toSeq.toDF("k", "v")

  /** Run [[FenceProbeMain]] in a fresh JVM; returns its token. */
  private def probe(mode: String, root: String, table: String): String = {
    import scala.sys.process._
    val java = s"${sys.props("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx2g",
      "-cp", sys.props("java.class.path"),
      "graft.operators.FenceProbeMain", mode, root, table)
    val out = new StringBuilder
    val code = cmd.!(ProcessLogger(l => { out.append(l).append('\n'); () },
      _ => ()))
    assert(code == 0, s"probe JVM exited $code:\n$out")
    val tokens = out.toString.linesIterator
      .filter(l => l == "FENCED" || l == "COMMITTED").toSeq
    assert(tokens.size == 1, s"probe printed no token:\n$out")
    tokens.head
  }

  test("two real JVMs: the second driver's commit is fenced; takeover lands and fences this one back") {
    val root = tmp("graft-2jvm"); val a = tmp("graft-2jvma")
    // this JVM claims the log (first commit auto-claims epoch 1)
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(kv(1L -> "a1"), a); t1.commit()
    assert(SnapshotTxn.latestTxn(spark, root) == 1)
    // 1. a fresh driver JVM attempting to commit is FENCED: nothing
    //    lands on the log or the table
    assert(probe("commit", root, a) == "FENCED")
    assert(SnapshotTxn.latestTxn(spark, root) == 1)
    assert(Snapshot.latestVersion(spark, a) == 1)
    // ...and this JVM still commits freely under its held epoch
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageAppend(kv(2L -> "a2"), a); t2.commit()
    // 2. the second JVM takes over EXPLICITLY and its commit lands
    assert(probe("claim", root, a) == "COMMITTED")
    assert(SnapshotTxn.latestTxn(spark, root) == 3)
    // ...which fences THIS driver (the zombie) at its next commit point
    val t3 = SnapshotTxn.begin(spark, root)
    t3.stageAppend(kv(3L -> "a3"), a)
    val e = intercept[IllegalStateException] { t3.commit() }
    assert(e.getMessage.contains("claimWriter"))
    // the zombie's data never landed; the probe's append did
    assert(rows(SnapshotTxn.readLatest(spark, root, a).orderBy("k"))
      .map(_.head) === Seq(1L, 2L, 100L))
    // explicit re-claim heals the original driver
    SnapshotTxn.claimWriter(spark, root)
    t3.commit()
    assert(SnapshotTxn.latestTxn(spark, root) == 4)
    ()
  }

  private def writeForeignWriter(root: String, epoch: Long,
                                 owner: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    Snapshot.writeFileAtomic(fs, s"$root/manifest/writer.txt",
      s"$root/manifest/.writer_tmp", Seq(s"$epoch\t$owner"))
  }

  test("takeover between the fence check and the CAS: the in-flight commit refuses, nothing lands") {
    // The r15 residual window, closed: a commit already past its entry
    // fence check used to run to its CAS whatever landed in between.
    // The pre-CAS re-verify (one small-file read under the log lock)
    // catches a takeover injected at the worst point — after this
    // commit's recovery and base verifies, right before the rename.
    val root = tmp("graft-precas"); val a = tmp("graft-precasa")
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(kv(1L -> "a1"), a); t1.commit()
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageAppend(kv(2L -> "a2"), a)
    SnapshotTxn.preCasHook =
      Some(() => writeForeignWriter(root, 99L, "foreign-driver"))
    try {
      val e = intercept[IllegalStateException] { t2.commit() }
      assert(e.getMessage.contains("claimWriter"), e.getMessage)
    } finally SnapshotTxn.preCasHook = None
    // the refused commit published NOTHING: no txn slot, table unmoved
    assert(SnapshotTxn.latestTxn(spark, root) == 1)
    assert(Snapshot.latestVersion(spark, a) == 1)
    // explicit re-claim heals; the parked staging then commits whole
    SnapshotTxn.claimWriter(spark, root)
    t2.commit()
    assert(rows(SnapshotTxn.readLatest(spark, root, a).orderBy("k"))
      .map(_.head) === Seq(1L, 2L))
  }

  test("begin(claim = true): a restarted sequential driver commits without manual claimWriter") {
    val root = tmp("graft-bclaim"); val a = tmp("graft-bclaima")
    val t1 = SnapshotTxn.begin(spark, root)
    t1.stagePublish(kv(1L -> "a1"), a); t1.commit()
    // a PREVIOUS driver's epoch sits on the log (this JVM doesn't hold
    // it) — the sequential batch-job restart shape
    writeForeignWriter(root, 7L, "dead-driver")
    // the claimless begin refuses at its commit point (the safe default)
    val t2 = SnapshotTxn.begin(spark, root)
    t2.stageAppend(kv(2L -> "a2"), a)
    val e = intercept[IllegalStateException] { t2.commit() }
    assert(e.getMessage.contains("claimWriter"), e.getMessage)
    // begin(claim = true) performs the takeover and the commit lands
    val t3 = SnapshotTxn.begin(spark, root, claim = true)
    t3.stageAppend(kv(3L -> "a3"), a)
    t3.commit()
    assert(rows(SnapshotTxn.readLatest(spark, root, a).orderBy("k"))
      .map(_.head) === Seq(1L, 3L))
    // holding the epoch already: claim = true is a no-op (no churn),
    // and the next commit still passes
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val before = Snapshot.readTextLines(fs, s"$root/manifest/writer.txt")
    val t4 = SnapshotTxn.begin(spark, root, claim = true)
    assert(Snapshot.readTextLines(fs,
      s"$root/manifest/writer.txt") === before)
    t4.stageAppend(kv(4L -> "a4"), a)
    t4.commit()
    // rows 1, 3, 4 — the fenced t2 append (k=2) never landed
    assert(rows(SnapshotTxn.readLatest(spark, root, a).orderBy("k"))
      .map(_.head) === Seq(1L, 3L, 4L))
  }
}
