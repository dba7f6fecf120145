package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: single-batch equivalence with the batch
  * join, and the multi-batch pairing of halves that arrive in different
  * micro-batches (the property a stream-static join cannot give). */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in nanos

  test("AvailableNow pair set equals the batch interval join") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Ingest.intervalJoinStream(spark, dir, "events.parquet",
        "user_id", "click", "error")
      .groupBy("l_key").agg(count(lit(1)).as("n"))
      .orderBy("l_key")
    val e = spark.read.parquet(s"$dir/events.parquet")
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").cast("timestamp").as("ct"))
    val r = e.filter(col("event_type") === "error")
      .select(col("user_id").as("ru"), col("ts").cast("timestamp").as("rt"))
    val batch = c.join(r, col("cu") === col("ru") &&
        col("rt") >= col("ct") - expr("INTERVAL 1 HOUR") &&
        col("rt") <= col("ct"))
      .groupBy(col("cu").as("l_key")).agg(count(lit(1)).as("n"))
      .orderBy("l_key")
    assert(rows(streamed).nonEmpty)
    assert(rows(streamed) === rows(batch))
  }

  test("halves arriving in different micro-batches still pair (within watermark)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    def writeOne(name: String, df: DataFrame, mtime: Long): Unit = {
      import java.nio.file.{Files => JF, Paths, StandardCopyOption}
      import java.nio.file.attribute.FileTime
      val stage = s"$dir/stage_$name"
      df.coalesce(1).write.parquet(stage)
      val part = JF.list(Paths.get(stage)).iterator()
      val src = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.startsWith("part-")).get
      JF.move(src, Paths.get(s"$dir/$name"), StandardCopyOption.ATOMIC_MOVE)
      JF.setLastModifiedTime(Paths.get(s"$dir/$name"), FileTime.fromMillis(mtime))
      ()
    }
    // batch 1: user 1's click at t=0.5h — its matching error arrives in
    // batch 2 (t=0.3h, inside the 1 h interval and the 1 h watermark).
    writeOne("b1.parquet", Seq(
      (1L, H / 2, 1L, "click", 0.0),
      (2L, H / 4, 2L, "error", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"), 1000000L)
    writeOne("b2.parquet", Seq(
      (3L, H * 3 / 10, 1L, "error", 7.0),
      (4L, H / 3, 2L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"), 2000000L)
    val joined = Ingest.intervalJoinStream(spark, dir, "b*.parquet",
        "user_id", "click", "error", maxFilesPerTrigger = 1)
      .select("l_key", "r_value").orderBy("l_key")
    // user 1: click(b1) paired with error(b2); user 2: click(b2) paired
    // with error(b1) — BOTH cross-batch directions work.
    assert(rows(joined) === Seq(Seq(1L, 7.0), Seq(2L, 5.0)))
  }

  /** Write `df` as ONE parquet file at `$dir/$name` (glob-matchable). */
  private def writeFile(dir: String, name: String, df: DataFrame): Unit = {
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    val stage = s"$dir/stage_$name"
    df.coalesce(1).write.parquet(stage)
    val part = JF.list(Paths.get(stage)).iterator()
    val src = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.startsWith("part-")).get
    JF.move(src, Paths.get(s"$dir/$name"), StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  test("left outer: unmatched clicks emit null rights once the flush sentinel expires them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjo").toString
    writeFile(dir, "ev.parquet", Seq(
      (1L, H / 2, 1L, "click", 0.0),      // no error for user 1 → null row
      (2L, H * 6 / 10, 2L, "click", 0.0), // user 2 pairs (error 0.4h ≤ 0.6h)
      (3L, H * 4 / 10, 2L, "error", 5.0),
      (4L, H / 3, 3L, "error", 9.0),      // error with no click: never emits
      // flush sentinels: both sides' watermarks move past every real
      // l_ts + window + delay, so the no-match verdicts become final
      (5L, 10L * H, -1L, "click", 0.0),
      (6L, 10L * H, -1L, "error", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    val joined = Ingest.intervalJoinLeftOuterStream(spark, dir, "ev.parquet",
        "user_id", "click", "error")
      .filter(col("l_key") =!= -1L)
      .select("l_key", "r_value").orderBy("l_key")
    assert(rows(joined) === Seq(Seq(1L, null), Seq(2L, 5.0)),
      "unmatched left must surface with null right after expiry")
  }

  test("full outer: both unmatched sides emit with nulls opposite after the flush") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjf").toString
    writeFile(dir, "ev.parquet", Seq(
      (1L, H / 2, 1L, "click", 0.0),      // no error for user 1 → null right
      (2L, H * 6 / 10, 2L, "click", 0.0), // user 2 pairs (error 0.4h ≤ 0.6h)
      (3L, H * 4 / 10, 2L, "error", 5.0),
      (4L, H / 3, 3L, "error", 9.0),      // ORPHAN error → null left (the
                                          // class left-outer drops)
      (5L, 10L * H, -1L, "click", 0.0),
      (6L, 10L * H, -1L, "error", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    val joined = Ingest.intervalJoinFullOuterStream(spark, dir, "ev.parquet",
        "user_id", "click", "error")
      .withColumn("u", coalesce(col("l_key"), col("r_key")))
      .filter(col("u") =!= -1L)
      .select("u", "l_id", "r_value").orderBy("u")
    assert(rows(joined) ===
      Seq(Seq(1L, 1L, null), Seq(2L, 2L, 5.0), Seq(3L, null, 9.0)),
      "matched, left-only, AND right-only rows must all surface")
  }

  test("left outer without a flush: trailing unmatched lefts stay un-emitted (documented delta)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssjo2").toString
    writeFile(dir, "ev.parquet", Seq(
      (1L, H / 2, 1L, "click", 0.0),
      (2L, H * 4 / 10, 2L, "error", 5.0), (3L, H * 6 / 10, 2L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    val joined = Ingest.intervalJoinLeftOuterStream(spark, dir, "ev.parquet",
        "user_id", "click", "error")
      .select("l_key", "r_value").orderBy("l_key")
    // the matched pair emits; user 1's no-match verdict is not final at
    // the last watermark, so its null row is (correctly) withheld
    assert(rows(joined) === Seq(Seq(2L, 5.0)))
  }
}
