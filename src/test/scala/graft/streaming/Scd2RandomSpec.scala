package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized differential for the streaming SCD2 fold: seeded-random
  * batch sequences (keys appearing, disappearing, changing, repeating
  * unchanged) against an independent driver-side state-machine model.
  * The gate row pins one fixed corpus; this covers the case lattice —
  * absent key / new key / same value / changed value — across many
  * random interleavings.
  */
class Scd2RandomSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, name: String, mtime: Long,
                         rows: Seq[(Long, Long)]): Unit = {
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val stage = s"$dir/.stage_$name"
    rows.toDF("id", "v").coalesce(1).write.parquet(stage)
    val parts = JF.list(Paths.get(stage)).iterator()
    val src = Iterator.continually(parts).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.startsWith("part-")).get
    JF.move(src, Paths.get(s"$dir/$name"), StandardCopyOption.ATOMIC_MOVE)
    JF.setLastModifiedTime(Paths.get(s"$dir/$name"),
      FileTime.fromMillis(mtime))
    ()
  }

  /** Driver-side reference: per-batch fold of the SCD2 state machine.
    * Returns (k, v, valid_from, valid_to[null = open]). */
  private def reference(batches: Seq[Map[Long, Long]])
      : Set[(Long, Long, Long, Option[Long])] = {
    var open = Map.empty[Long, (Long, Long)] // k -> (v, validFrom)
    val closed = scala.collection.mutable.ListBuffer
      .empty[(Long, Long, Long, Option[Long])]
    batches.zipWithIndex.foreach { case (kv, b) =>
      kv.foreach { case (k, v) =>
        open.get(k) match {
          case None => open += k -> (v, b.toLong)
          case Some((v0, _)) if v0 == v => () // unchanged
          case Some((v0, f0)) =>
            closed += ((k, v0, f0, Some(b.toLong)))
            open += k -> (v, b.toLong)
        }
      }
    }
    closed.toSet ++ open.map { case (k, (v, f)) => (k, v, f, None) }
  }

  test("random batch sequences match the driver-side state machine") {
    val rnd = new scala.util.Random(20260814L)
    val shape: DataFrame => DataFrame = b =>
      b.select(col("id").as("k"), col("v"))
    for (round <- 1 to 3) {
      val src = java.nio.file.Files
        .createTempDirectory(s"graft-scd2r$round").toString
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-scd2ro$round").toString
      val nKeys = 2 + rnd.nextInt(6)
      val batches = (0 until 3).map { b =>
        (0L until nKeys.toLong)
          .filter(_ => rnd.nextBoolean())
          .map(k => k -> rnd.nextInt(3).toLong).toMap
      }
      batches.zipWithIndex.foreach { case (kv, b) =>
        writeBatch(src, s"b$b.parquet", 1000L * (b + 1), kv.toSeq)
      }
      val got = rows(Ingest.scd2Stream(spark, src, "b*.parquet",
          s"$out/dest", s"$out/chk", Seq("k"), shape))
        .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long],
          r(2).asInstanceOf[Long],
          Option(r(3)).map(_.asInstanceOf[Long]))).toSet
      assert(got === reference(batches),
        s"round $round diverged; batches=$batches")
    }
  }
}
