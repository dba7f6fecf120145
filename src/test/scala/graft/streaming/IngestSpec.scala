package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  test("streaming AvailableNow ingest matches the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Ingest.groupedCounts(spark, dir, "events.parquet", "event_type")
      .orderBy("event_type")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type")
    assert(rows(streamed) === rows(batch))
  }
}

/** Multi-micro-batch behavior of the windowed and enrichment streams:
  * `maxFilesPerTrigger = 1` turns each delivery file into its own
  * micro-batch (file-source batch order follows mtime), proving the
  * read-out contracts under real batch splits — the same rig
  * SessionizeSpec uses for the bridging-event case. */
class MultiBatchIngestSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  /** Write `df` as ONE parquet file named `name` with a pinned mtime. */
  private def writeOne(dir: String, name: String, df: DataFrame, mtime: Long): Unit = {
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val stage = s"$dir/stage_$name"
    df.coalesce(1).write.parquet(stage)
    val part = JF.list(Paths.get(stage)).iterator()
    val src = Iterator.continually(part)
      .takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.startsWith("part-")).get
    val dst = Paths.get(s"$dir/$name")
    JF.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
    JF.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    ()
  }

  private val H = 3600L * 1000000000L // one hour in nanos

  test("windowedCounts: per-file micro-batches equal the single-batch answer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mb-win").toString
    // b2 updates a (window, key) that b1 already emitted, within the 1 h
    // watermark of b1's max event time (1.1 h - 1 h = 0.1 h < 0.3 h).
    writeOne(dir, "b1.parquet", Seq(
      (1L, H / 10), (1L, H / 5), (2L, H * 3 / 20), (1L, H + H / 10)
    ).toDF("user_id", "ts"), mtime = 1000000L)
    writeOne(dir, "b2.parquet", Seq(
      (1L, H * 3 / 10), (2L, H + H / 5)
    ).toDF("user_id", "ts"), mtime = 2000000L)
    val multi = rows(Ingest.windowedCounts(spark, dir, "b*.parquet", "user_id",
      maxFilesPerTrigger = 1).orderBy("wstart", "user_id"))
    // raw emissions: same (window,key) appeared in MORE than one batch —
    // the run really was multi-batch and a naive read-out would be stale
    val raw = rows(spark.table("graft_windows"))
    assert(raw.size > raw.map(r => (r(0), r(1))).distinct.size)
    val single = rows(Ingest.windowedCounts(spark, dir, "b*.parquet", "user_id")
      .orderBy("wstart", "user_id"))
    assert(multi === single)
    // and the answer itself: u1 has 3 events in hour 0, 1 in hour 1
    assert(multi.map(r => (r(1), r(2))) ===
      Seq((1L, 3L), (2L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("windowedCounts: a batch wholly below the watermark is dropped late") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mb-late").toString
    // b1 pushes the watermark to 2.5 h - 1 h = 1.5 h; two batches later
    // (watermark propagation to the operator filter lags one batch —
    // measured, not assumed) an event in window [0,1h), whose END (1 h)
    // is below that watermark, is dropped as too late. (An event in a
    // still-open window would be accepted however late it arrives:
    // window-agg lateness is judged against window END, not event time.)
    writeOne(dir, "b1.parquet",
      Seq((1L, H / 10), (1L, H * 5 / 2)).toDF("user_id", "ts"), 1000000L)
    writeOne(dir, "b2.parquet",
      Seq((1L, H * 13 / 5)).toDF("user_id", "ts"), 2000000L)
    writeOne(dir, "b3.parquet",
      Seq((2L, H / 2)).toDF("user_id", "ts"), 3000000L)
    val multi = rows(Ingest.windowedCounts(spark, dir, "b*.parquet", "user_id",
      maxFilesPerTrigger = 1).orderBy("wstart", "user_id"))
    val single = rows(Ingest.windowedCounts(spark, dir, "b*.parquet", "user_id")
      .orderBy("wstart", "user_id"))
    // single-batch: watermark starts at 0, every event counts
    assert(single.map(r => (r(1), r(2))) === Seq((1L, 1L), (2L, 1L), (1L, 2L)))
    // multi-batch: user 2's late event is dropped — the documented
    // equivalence bound, asserted rather than assumed
    assert(multi.map(r => (r(1), r(2))) === Seq((1L, 1L), (1L, 2L)))
  }

  test("enrichStream: per-file micro-batches equal the single-batch answer") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val dir = java.nio.file.Files.createTempDirectory("graft-mb-enrich").toString
    writeOne(dir, "b1.parquet",
      Seq((1L, 1.50), (2L, 2.25)).toDF("user_id", "value"), 1000000L)
    writeOne(dir, "b2.parquet",
      Seq((1L, 0.25), (3L, 9.99)).toDF("user_id", "value"), 2000000L)
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("k", "seg")
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == "graft_stream_enrich" && e.progress.numInputRows > 0)
          { batches.incrementAndGet(); () }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val multi = rows(Ingest.enrichStream(spark, dir, "b*.parquet", dim,
        "user_id", "k", "seg", "value", maxFilesPerTrigger = 1).orderBy("seg"))
      // listener events are async; give them a moment to drain
      val deadline = System.currentTimeMillis() + 15000
      while (batches.get() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(batches.get() >= 2, "expected one micro-batch per delivery file")
      val single = rows(Ingest.enrichStream(spark, dir, "b*.parquet", dim,
        "user_id", "k", "seg", "value").orderBy("seg"))
      assert(multi === single)
      // moneySum scales to cents and back: exact 11.74 / 2.25, no float dust
      assert(multi === Seq(Seq("A", 3L, 11.74), Seq("B", 1L, 2.25)))
    } finally spark.streams.removeListener(listener)
  }
}
