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
}
