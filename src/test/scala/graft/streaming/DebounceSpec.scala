package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** transformWithState debounce: sequential last-KEPT semantics, batch
  * parity via the seq-tagged preview, and cross-micro-batch ordering. */
class DebounceSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // one second in nanos (legacy long-ts fixtures)
  private val GapUs = 5000000L // 5 s
  // fixture epoch base: transformWithState's EventTime mode drops rows
  // at-or-before the watermark, and the INITIAL watermark is 0 — an
  // event at exactly epoch 0 would be filtered as late (real event
  // times are nowhere near 1970; only synthetic fixtures hit this)
  private val T0 = 1000000L * S

  /** Naive sequential replay of the last-KEPT rule. */
  private def naive(evs: Seq[(Long, String, Long)]): Map[(Long, String), (Long, Long)] =
    evs.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      var last = Long.MinValue; var kept = 0L; var dropped = 0L
      es.map(_._3).sorted.foreach { us =>
        if (last == Long.MinValue || us - last > GapUs) { last = us; kept += 1 }
        else dropped += 1
      }
      k -> ((kept, dropped))
    }

  private def writeFile(dir: String, name: String, df: DataFrame,
                        mtime: Long = 0L): Unit = {
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val stage = s"$dir/stage_$name"
    df.coalesce(1).write.parquet(stage)
    val part = JF.list(Paths.get(stage)).iterator()
    val src = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.startsWith("part-")).get
    JF.move(src, Paths.get(s"$dir/$name"), StandardCopyOption.ATOMIC_MOVE)
    if (mtime > 0)
      JF.setLastModifiedTime(Paths.get(s"$dir/$name"), FileTime.fromMillis(mtime))
    ()
  }

  test("last-KEPT differs from lag-anchored: a burst re-arms at the kept anchor") {
    val dir = java.nio.file.Files.createTempDirectory("graft-deb").toString
    // burst at t = 0s, 4s, 8s with a 5s gap: last-KEPT keeps 0 and 8
    // (8 − 0 > 5); the lag rule would drop 8 too (8 − 4 ≤ 5)
    writeFile(dir, "ev.parquet", Seq(
      (1L, T0 + 0L * S, 7L, "click", 0.0),
      (2L, T0 + 4L * S, 7L, "click", 0.0),
      (3L, T0 + 8L * S, 7L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    val got = rows(Debounce.debouncedCounts(spark, dir, "ev.parquet", GapUs))
    assert(got === Seq(Seq(7L, "click", 2L, 1L)))
  }

  test("AvailableNow counts equal the naive sequential replay on real data") {
    val dir = "/root/testdata/sf0.001"
    val got = Debounce.debouncedCounts(spark, dir, "events.parquet", GapUs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val evs = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === naive(evs))
    assert(got.nonEmpty)
  }

  test("an out-of-order event in a later micro-batch folds in timestamp order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-deb2").toString
    // batch 1: events at 0s and 7s (both kept under 5s gap).
    // batch 2: a LATE event at 4s — within the watermark, must fold
    // BETWEEN them: 4−0 ≤ 5 → dropped; 7−0 > 5 → 7 stays kept.
    writeFile(dir, "b1.parquet", Seq(
      (1L, T0 + 0L * S, 1L, "click", 0.0),
      (2L, T0 + 7L * S, 1L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"), 1000000L)
    writeFile(dir, "b2.parquet", Seq(
      (3L, T0 + 4L * S, 1L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"), 2000000L)
    val got = rows(Debounce.debouncedCounts(spark, dir, "b*.parquet", GapUs,
      maxFilesPerTrigger = 1))
    assert(got === Seq(Seq(1L, "click", 2L, 1L)))
  }
}
