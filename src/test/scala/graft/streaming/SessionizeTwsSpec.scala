package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Timer-driven session closure on transformWithState: the quiet-key
  * emission fMGWS can't do, batch parity, and out-of-order bridging. */
class SessionizeTwsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // one second in nanos (long-ts fixtures)
  private val T0 = 1000000L * S // clear of the epoch-0 initial watermark
  private val GapUs = 60000000L // 1 min

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

  test("a QUIET key's session closes via its event-time timer, no input needed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tws1").toString
    // batch 1: user 1 only. batch 2: user 99's far-future event advances
    // the watermark — user 1 gets NO rows, yet its session must emit.
    writeFile(dir, "b1.parquet", Seq(
      (1L, T0 + 0L * S, 1L, "view", 0.0),
      (2L, T0 + 10L * S, 1L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"), 1000000L)
    writeFile(dir, "b2.parquet", Seq(
      (3L, T0 + 100000L * S, 99L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"), 2000000L)
    val got = rows(SessionizeTws.closedSessions(spark, dir, "b*.parquet",
        GapUs, maxFilesPerTrigger = 1)
      .filter(col("user_id") === 1L))
    assert(got === Seq(Seq(1L, 1, (T0 / 1000L), (T0 / 1000L + 10000000L), 2L)),
      "the quiet user's session must close via the timer path")
  }

  test("closed sessions equal the batch gaps-and-islands on real data + flush") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tws2").toString
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(dir)
    // flush sentinel far past every session's seal point
    val flush = ev.agg(max(col("ts")).as("ts0")).select(
      lit(-1L).cast(ev.schema("event_id").dataType).as("event_id"),
      (col("ts0") + expr("INTERVAL 3 HOURS"))
        .cast(ev.schema("ts").dataType).as("ts"),
      lit(-1L).cast(ev.schema("user_id").dataType).as("user_id"),
      lit("view").as("event_type"),
      lit(0.0).cast(ev.schema("value").dataType).as("value"),
      lit(null).cast(ev.schema("props").dataType).as("props"))
    flush.select(ev.columns.map(col): _*)
      .write.mode("append").parquet(dir)
    val gap = 1800000000L // 30 min
    val got = SessionizeTws.closedSessions(spark, dir, "*.parquet", gap)
      .filter(col("user_id") =!= -1L).orderBy("user_id", "sid")
    val w = Window.partitionBy("user_id").orderBy("us")
    val batch = ev.select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("brk", when(lag(col("us"), 1).over(w).isNull ||
        col("us") - lag(col("us"), 1).over(w) > gap, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "sid")
    assert(rows(got).nonEmpty)
    assert(rows(got) === rows(batch))
  }

  test("a late bridging event merges two would-be sessions before closure") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tws3").toString
    // batch 1: events at 0s and 90s — a 60s gap would split them.
    // batch 2: a LATE event at 50s (within lateness) bridges the gap,
    // then a far event seals everything: ONE session of 3 events.
    writeFile(dir, "b1.parquet", Seq(
      (1L, T0 + 0L * S, 1L, "view", 0.0),
      (2L, T0 + 90L * S, 1L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"), 1000000L)
    writeFile(dir, "b2.parquet", Seq(
      (3L, T0 + 50L * S, 1L, "view", 0.0),
      (4L, T0 + 100000L * S, 99L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"), 2000000L)
    val got = rows(SessionizeTws.closedSessions(spark, dir, "b*.parquet",
        GapUs, maxFilesPerTrigger = 1)
      .filter(col("user_id") === 1L))
    assert(got === Seq(Seq(1L, 1, (T0 / 1000L), (T0 / 1000L + 90000000L), 3L)))
  }
}
