package graft.streaming

import graft.SparkSpec
import graft.operators.Behavior
import org.apache.spark.sql.functions._

class FunnelizeSpec extends SparkSpec {

  private val steps = Seq("view", "click", "purchase")
  private val horizon = 7L * 24 * 3600 * 1000000

  test("streaming funnel matches the batch operator on the events table") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Funnelize.userFunnels(spark, dir, "events.parquet",
        steps, horizon)
      .orderBy("user_id")
    val batch = Behavior.windowFunnel(
        spark.read.parquet(s"$dir/events.parquet"), "user_id",
        unix_micros(col("ts").cast("timestamp")), col("event_type"),
        steps, horizon)
      .select(col("user").as("user_id"), col("t0"), col("t1"), col("t2"),
        col("reached"))
      .orderBy("user_id")
    assert(rows(streamed) === rows(batch))
  }

  test("out-of-order step events across micro-batches funnel correctly") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    def ev(ts: Long, idx: Int) = Funnelize.FEvent(1L, ts, idx,
      new java.sql.Timestamp(ts / 1000))
    val step = Funnelize.funnelStep(3, 10000L) _
    // Batch 1 (watermark 0): click at t=200 arrives BEFORE its view —
    // a naive fold would drop it (no anchor yet). It must buffer.
    val s1 = TestGroupState.create[Funnelize.FunnelState](
      optionalState = Optional.empty(), GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(0L),
      hasTimedOut = false)
    val out1 = step(1L, Iterator(ev(200, 1)), s1).toSeq
    assert(out1.head.slots === Seq(Funnelize.Unset, Funnelize.Unset, Funnelize.Unset))
    // Batch 2 delivers the view at t=100 (late but above watermark):
    // preview now chains view(100) -> click(200).
    val s2 = TestGroupState.create[Funnelize.FunnelState](
      optionalState = Optional.of(s1.get), GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(0L),
      hasTimedOut = false)
    val out2 = step(1L, Iterator(ev(100, 0)), s2).toSeq
    assert(out2.head.slots === Seq(100L, 200L, Funnelize.Unset))
    // Batch 3: watermark passes everything -> buffer finalizes into state.
    val s3 = TestGroupState.create[Funnelize.FunnelState](
      optionalState = Optional.of(s2.get), GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(1L),
      hasTimedOut = false)
    val out3 = step(1L, Iterator.empty, s3).toSeq
    assert(out3.head.slots === Seq(100L, 200L, Funnelize.Unset))
    assert(s3.get.pending.isEmpty && s3.get.slots === Seq(100L, 200L, Funnelize.Unset))
  }

  test("cross-micro-batch pairing through real file-source batches") {
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    import spark.implicits._
    val dir = JF.createTempDirectory("graft-sfunnel").toString
    def writeOne(name: String, rows: Seq[(Long, Long, String)], mtime: Long): Unit = {
      val stage = s"$dir/stage_$name"
      rows.toDF("user_id", "ts", "event_type")
        .coalesce(1).write.parquet(stage)
      val part = JF.list(Paths.get(stage)).iterator()
      val src = Iterator.continually(part)
        .takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.startsWith("part-")).get
      val dst = Paths.get(s"$dir/$name")
      JF.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      JF.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    // ts is a legacy nanos long here; 1 µs = 1000 ns. View in batch 1,
    // click in batch 2, purchase in batch 3 — completion requires state
    // carried across all three micro-batches.
    writeOne("b1.parquet", Seq((1L, 1000000L, "view")), 1000000L)
    writeOne("b2.parquet", Seq((1L, 2000000L, "click")), 2000000L)
    writeOne("b3.parquet", Seq((1L, 3000000L, "purchase")), 3000000L)
    val out = Funnelize.userFunnels(spark, dir, "b*.parquet", steps,
      horizonUs = 10000L, maxFilesPerTrigger = 1)
    assert(rows(out) === Seq(Seq(1L, 1000L, 2000L, 3000L, 3L)))
  }
}
