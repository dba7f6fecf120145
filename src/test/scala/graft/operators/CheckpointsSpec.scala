package graft.operators

import graft.SparkSpec
import graft.core.Checkpoints
import org.apache.spark.sql.functions._

/** The cluster-posture switch: every iterative operator that pins plan
  * lineage (lineage walks, CC label propagation, the global rank) must
  * produce identical results whether the session is in "local" (default)
  * or "reliable" checkpoint mode — one conf flips all of them. */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Checkpoints.ModeKey, mode)
    try body finally spark.conf.unset(Checkpoints.ModeKey)
  }

  private def runAll(): (Seq[Seq[Any]], Seq[Seq[Any]], Seq[Seq[Any]]) = {
    // A 3-level chain DAG + a fork: 1→2→3, 4→3.
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L)).toDF("child", "parent")
    val anc = rows(Lineage.ancestors(edges).orderBy("node", "anc", "depth"))
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = rows(Dedup.connectedComponents(pairs).orderBy("id"))
    val ranked = rows(Align.alignSorted(
        Seq("b", "a", "c").toDF("x"), Seq("q", "p", "r").toDF("y"),
        col("x"), col("y")).orderBy("x"))
    (anc, cc, ranked)
  }

  test("reliable mode produces identical results to local mode") {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    val local = withMode("local")(runAll())
    val reliable = withMode("reliable")(runAll())
    assert(local === reliable)
    // Reliable mode really wrote into the fault-tolerant checkpoint dir.
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(wrote > 0, "reliable mode should materialize checkpoint files")
  }

  test("an unknown mode fails loudly") {
    val e = intercept[IllegalArgumentException] {
      withMode("bogus")(Checkpoints.pin(spark.range(1).toDF()))
    }
    assert(e.getMessage.contains(Checkpoints.ModeKey))
  }
}
