package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** scd2Stream's CDC contract beyond the gate row: the dest is a LIVE
  * table — a later run with the same checkpoint processes only newly
  * arrived batch files and folds them onto the existing open/closed
  * state, landing on exactly the history a from-scratch run over all
  * batches produces. That incremental = full equivalence is the whole
  * point of keeping per-batch work O(open + delta).
  */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, name: String, mtime: Long,
                         rows: Seq[(Long, String, Long)]): Unit = {
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val stage = s"$dir/.stage_$name"
    rows.toDF("id", "seg", "bal").coalesce(1).write.parquet(stage)
    val parts = JF.list(Paths.get(stage)).iterator()
    val src = Iterator.continually(parts).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.startsWith("part-")).get
    val tgt = Paths.get(s"$dir/$name")
    JF.move(src, tgt, StandardCopyOption.ATOMIC_MOVE)
    JF.setLastModifiedTime(tgt, FileTime.fromMillis(mtime))
    ()
  }

  private val shape: DataFrame => DataFrame = b =>
    b.select(col("id").as("k"), col("seg"), col("bal"))

  private def run(src: String, out: String): Seq[Seq[Any]] =
    rows(Ingest.scd2Stream(spark, src, "b*.parquet",
        s"$out/dest", s"$out/chk", Seq("k"), shape)
      .orderBy("k", "valid_from"))

  test("incremental catch-up equals the from-scratch history") {
    val src = java.nio.file.Files.createTempDirectory("graft-scd2s").toString
    val outInc = java.nio.file.Files.createTempDirectory("graft-scd2o1").toString
    val outFull = java.nio.file.Files.createTempDirectory("graft-scd2o2").toString
    writeBatch(src, "b0.parquet", 1000L,
      Seq((1L, "A", 10L), (2L, "B", 20L)))
    writeBatch(src, "b1.parquet", 2000L,
      Seq((1L, "A", 10L),   // unchanged → open row keeps valid_from 0
        (2L, "B2", 20L),    // changed   → close at 1, reopen at 1
        (3L, "C", 30L)))    // new key   → open at 1
    val after2 = run(src, outInc)
    assert(after2 === Seq(
      Seq(1L, "A", 10L, 0L, null),
      Seq(2L, "B", 20L, 0L, 1L),
      Seq(2L, "B2", 20L, 1L, null),
      Seq(3L, "C", 30L, 1L, null)))
    // a third batch ARRIVES; the same checkpoint picks up only b2
    writeBatch(src, "b2.parquet", 3000L,
      Seq((1L, "A9", 11L), (3L, "C", 30L)))
    val incremental = run(src, outInc)
    val fromScratch = run(src, outFull)
    assert(incremental === fromScratch,
      "incremental fold diverged from the from-scratch history")
    assert(incremental.exists(r => r(0) == 1L && r(4) == 2L),
      "user 1's first version must be closed at batch 2")
  }

  test("crash between the open-swap renames recovers from the aside copy") {
    import org.apache.hadoop.fs.Path
    val src = java.nio.file.Files.createTempDirectory("graft-scd2c").toString
    val out = java.nio.file.Files.createTempDirectory("graft-scd2co").toString
    writeBatch(src, "b0.parquet", 1000L, Seq((1L, "A", 10L), (2L, "B", 20L)))
    run(src, out)
    // simulate the crash window: old open/ moved aside, new one never
    // renamed in (the exact state between the two commit renames)
    val fs = new Path(out).getFileSystem(spark.sessionState.newHadoopConf())
    val open = new Path(s"$out/dest/open")
    assert(fs.exists(open))
    assert(fs.rename(open, new Path(s"$out/dest/open_prev_9")))
    assert(!fs.exists(open))
    // next batch arrives for key 2 only; without the aside restore the
    // replay would see an EMPTY base and silently drop key 1's history
    writeBatch(src, "b1.parquet", 2000L, Seq((2L, "B2", 20L)))
    val got = run(src, out)
    assert(got === Seq(
      Seq(1L, "A", 10L, 0L, null),   // survived the crash window
      Seq(2L, "B", 20L, 0L, 1L),
      Seq(2L, "B2", 20L, 1L, null)))
    assert(!fs.exists(new Path(s"$out/dest/open_prev_9")),
      "the aside must be cleaned up after restore")
  }

  test("absent key keeps its open row untouched across batches") {
    val src = java.nio.file.Files.createTempDirectory("graft-scd2a").toString
    val out = java.nio.file.Files.createTempDirectory("graft-scd2ao").toString
    writeBatch(src, "b0.parquet", 1000L, Seq((7L, "X", 1L)))
    writeBatch(src, "b1.parquet", 2000L, Seq((8L, "Y", 2L)))
    assert(run(src, out) === Seq(
      Seq(7L, "X", 1L, 0L, null),
      Seq(8L, "Y", 2L, 1L, null)))
  }
}
