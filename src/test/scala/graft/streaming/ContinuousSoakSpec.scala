package graft.streaming

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicReference

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous-trigger soak: the three stateful streaming entry points
  * driven under `Trigger.ProcessingTime` — a long-lived query consuming
  * files AS THEY LAND from a concurrent writer thread — must end in the
  * same final state as one-shot ingestion of the finished directory.
  * This is the deployment mode (the gate runs AvailableNow for
  * determinism); nothing in the soak path uses a one-shot trigger.
  *
  * Batch boundaries are made deterministic, not sleep-lucky: the writer
  * calls `processAllAvailable()` after each file (thread-safe; Spark's
  * own streaming tests drive queries this way), so every delivery lands
  * in its own micro-batch and the multi-batch read-out contracts are
  * genuinely exercised. */
class ContinuousSoakSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000000L // one hour in nanos

  /** Write `df` as ONE parquet file named `name`, staged then atomically
    * moved so the running file source never sees a partial file. */
  private def writeOne(dir: String, name: String, df: DataFrame): Unit = {
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    val stage = s"$dir/.stage_$name"
    df.coalesce(1).write.parquet(stage)
    val part = JF.list(Paths.get(stage)).iterator()
    val src = Iterator.continually(part)
      .takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.startsWith("part-")).get
    JF.move(src, Paths.get(s"$dir/$name"), StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Drip rig: returns (trigger, finish) where `finish` releases the
    * writer thread (which needs the live query handle to force per-file
    * batches), joins it, drains, and stops the query. */
  private def dripRig(writer: StreamingQuery => Unit): (Trigger, StreamingQuery => Unit) = {
    val qRef = new AtomicReference[StreamingQuery]()
    val ready = new CountDownLatch(1)
    val err = new AtomicReference[Throwable]()
    val t = new Thread(() => {
      try { ready.await(); writer(qRef.get()) }
      catch { case e: Throwable => err.set(e) }
    })
    t.setDaemon(true)
    t.start()
    val finish: StreamingQuery => Unit = { q =>
      qRef.set(q); ready.countDown()
      t.join(120000)
      assert(!t.isAlive, "drip writer did not finish in time")
      if (err.get() != null) throw err.get()
      q.processAllAvailable()
      q.stop()
    }
    (Trigger.ProcessingTime("50 milliseconds"), finish)
  }

  test("windowedCounts soak: dripped ProcessingTime run equals one-shot state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-win").toString
    // f1 exists up front (schema inference needs one file); f2/f3 land
    // while the query runs. f3 carries a window-0 straggler that stays
    // inside the 1 h watermark (max event 1.2 h → watermark 0.2 h <
    // window end 1 h), so continuous and one-shot answers coincide.
    writeOne(dir, "f1.parquet",
      Seq((1L, H / 10), (2L, H * 3 / 20)).toDF("user_id", "ts"))
    val (trigger, finish) = dripRig { q =>
      writeOne(dir, "f2.parquet",
        Seq((1L, H * 3 / 10), (1L, H + H / 10)).toDF("user_id", "ts"))
      q.processAllAvailable()
      writeOne(dir, "f3.parquet",
        Seq((2L, H + H / 5), (1L, H / 2)).toDF("user_id", "ts"))
    }
    val soaked = rows(Ingest.windowedCounts(spark, dir, "f*.parquet", "user_id",
      trigger = trigger, finish = finish).orderBy("wstart", "user_id"))
    // proof of multi-batch: some (window, key) was re-emitted in a later
    // micro-batch, so a naive (non-max) read-out would have been stale
    val raw = rows(spark.table("graft_windows"))
    assert(raw.size > raw.map(r => (r(0), r(1))).distinct.size)
    val oneShot = rows(Ingest.windowedCounts(spark, dir, "f*.parquet", "user_id")
      .orderBy("wstart", "user_id"))
    assert(soaked === oneShot)
    assert(soaked.map(r => (r(1), r(2))) ===
      Seq((1L, 3L), (2L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("sessionize soak: dripped ProcessingTime run equals one-shot state") {
    val gap = H / 2
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-sess").toString
    writeOne(dir, "f1.parquet",
      Seq((1L, H / 10), (2L, H * 3 / 10)).toDF("user_id", "ts"))
    val (trigger, finish) = dripRig { q =>
      // u1 gets a same-session event, then a new session beyond the gap
      writeOne(dir, "f2.parquet",
        Seq((1L, H / 5), (1L, H * 3 / 2)).toDF("user_id", "ts"))
      q.processAllAvailable()
      // a later event pushes the watermark so earlier sessions finalize
      writeOne(dir, "f3.parquet",
        Seq((2L, H * 2)).toDF("user_id", "ts"))
    }
    val soaked = rows(Sessionize.userSessions(spark, dir, "f*.parquet", gap,
      trigger = trigger, finish = finish).orderBy("user_id"))
    val oneShot = rows(Sessionize.userSessions(spark, dir, "f*.parquet", gap)
      .orderBy("user_id"))
    assert(soaked === oneShot)
    // u1: sessions {0.1h, 0.2h} and {1.5h}; u2: {0.3h} and {2h}
    assert(soaked === Seq(Seq(1L, 2L, 3L), Seq(2L, 2L, 2L)))
  }

  test("intervalJoinStream soak: dripped ProcessingTime run equals one-shot state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-ssj").toString
    // f1 holds user 1's click and user 2's error; their partners land in
    // later drip files — BOTH cross-batch pairing directions run under
    // the continuous trigger, inside the 1 h interval and watermark.
    writeOne(dir, "f1.parquet", Seq(
      (1L, H / 2, 1L, "click", 0.0), (2L, H / 4, 2L, "error", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    val (trigger, finish) = dripRig { q =>
      writeOne(dir, "f2.parquet", Seq(
        (3L, H * 3 / 10, 1L, "error", 7.0)
      ).toDF("event_id", "ts", "user_id", "event_type", "value"))
      q.processAllAvailable()
      writeOne(dir, "f3.parquet", Seq(
        (4L, H / 3, 2L, "click", 0.0)
      ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    }
    val soaked = rows(Ingest.intervalJoinStream(spark, dir, "f*.parquet",
        "user_id", "click", "error", trigger = trigger, finish = finish)
      .select("l_key", "r_value").orderBy("l_key"))
    val oneShot = rows(Ingest.intervalJoinStream(spark, dir, "f*.parquet",
        "user_id", "click", "error")
      .select("l_key", "r_value").orderBy("l_key"))
    assert(soaked === oneShot)
    assert(soaked === Seq(Seq(1L, 7.0), Seq(2L, 5.0)))
  }

  test("dedupStream soak: dripped ProcessingTime run equals one-shot key set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-dedup").toString
    // duplicates land in LATER deliveries, within the 1 h watermark of
    // their first sighting, so state hasn't expired and they drop in the
    // continuous run exactly as in the one-shot run
    writeOne(dir, "f1.parquet",
      Seq((1L, H / 10), (2L, H / 8)).toDF("user_id", "ts"))
    val (trigger, finish) = dripRig { q =>
      writeOne(dir, "f2.parquet",
        Seq((1L, H / 5), (3L, H / 4)).toDF("user_id", "ts")) // u1 dup
      q.processAllAvailable()
      writeOne(dir, "f3.parquet",
        Seq((2L, H / 3), (3L, H / 2)).toDF("user_id", "ts")) // u2,u3 dups
    }
    val soaked = rows(Ingest.dedupStream(spark, dir, "f*.parquet",
      Seq("user_id"), trigger = trigger, finish = finish).orderBy("user_id"))
    val oneShot = rows(Ingest.dedupStream(spark, dir, "f*.parquet",
      Seq("user_id")).orderBy("user_id"))
    assert(soaked === oneShot)
    assert(soaked === Seq(Seq(1L), Seq(2L), Seq(3L)))
  }

  test("upsertExactlyOnce restart: a resumed query replays offsets, not data") {
    val src = java.nio.file.Files.createTempDirectory("graft-restart-src").toString
    val base = java.nio.file.Files.createTempDirectory("graft-restart").toString
    writeOne(src, "f1.parquet",
      Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "v", "ts"))
    // run 1: continuous trigger, sees f1, stopped — a deploy restart
    val (t1, fin1) = dripRig { q => q.processAllAvailable() }
    Ingest.upsertExactlyOnce(spark, src, "f*.parquet",
      s"$base/dest", s"$base/ckpt", keys = Seq("id"), tieBreak = Seq("ts"),
      trigger = t1, finish = fin1)
    // run 2: SAME checkpoint, f2 drips in while the resumed query runs
    val (t2, fin2) = dripRig { q =>
      writeOne(src, "f2.parquet",
        Seq((1L, "a2", 20L), (3L, "c", 20L)).toDF("id", "v", "ts"))
      q.processAllAvailable()
    }
    val n = Ingest.upsertExactlyOnce(spark, src, "f*.parquet",
      s"$base/dest", s"$base/ckpt", keys = Seq("id"), tieBreak = Seq("ts"),
      trigger = t2, finish = fin2)
    assert(n === 3)
    // the checkpoint's per-batch source log is the ground truth for what
    // the resumed source ADMITTED (numInputRows would double-count the
    // foreachBatch's two passes): batch 0 = exactly f1, batch 1 = exactly
    // f2 — the restart replayed offsets, it did not re-ingest files
    def admitted(b: Int): Seq[String] =
      java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$base/ckpt/sources/0/$b"))
        .linesIterator.filter(_.startsWith("{"))
        .map(l => "\"path\":\"(.*?)\"".r.findFirstMatchIn(l).get.group(1))
        .map(_.split('/').last).toSeq
    assert(admitted(0) === Seq("f1.parquet"))
    assert(admitted(1) === Seq("f2.parquet"))
    val fin = rows(spark.read.parquet(s"$base/dest")
      .select("id", "v").orderBy("id"))
    assert(fin === Seq(Seq(1L, "a2"), Seq(2L, "b"), Seq(3L, "c")))
  }

  test("upsertExactlyOnce soak: dripped ProcessingTime run equals one-shot state") {
    val src = java.nio.file.Files.createTempDirectory("graft-soak-up-src").toString
    val base = java.nio.file.Files.createTempDirectory("graft-soak-up").toString
    // overlapping keys across deliveries; ts grows with delivery order so
    // the cross-batch winner (latest batch) and the tieBreak winner
    // (max ts) agree — which is exactly what makes continuous and
    // one-shot ingestion converge on the same final table
    writeOne(src, "f1.parquet",
      Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "v", "ts"))
    val (trigger, finish) = dripRig { q =>
      writeOne(src, "f2.parquet",
        Seq((2L, "b2", 20L), (3L, "c", 20L)).toDF("id", "v", "ts"))
      q.processAllAvailable()
      writeOne(src, "f3.parquet",
        Seq((1L, "a3", 30L), (4L, "d", 30L)).toDF("id", "v", "ts"))
    }
    val n = Ingest.upsertExactlyOnce(spark, src, "f*.parquet",
      s"$base/dest_soak", s"$base/ckpt_soak", keys = Seq("id"),
      tieBreak = Seq("ts"), trigger = trigger, finish = finish)
    assert(n === 4)
    val soaked = rows(spark.read.parquet(s"$base/dest_soak")
      .select("id", "v", "ts").orderBy("id"))
    Ingest.upsertExactlyOnce(spark, src, "f*.parquet",
      s"$base/dest_one", s"$base/ckpt_one", keys = Seq("id"),
      tieBreak = Seq("ts"))
    val oneShot = rows(spark.read.parquet(s"$base/dest_one")
      .select("id", "v", "ts").orderBy("id"))
    assert(soaked === oneShot)
    assert(soaked === Seq(Seq(1L, "a3", 30L), Seq(2L, "b2", 20L),
      Seq(3L, "c", 20L), Seq(4L, "d", 30L)))
  }

  test("funnelize soak: dripped ProcessingTime run equals one-shot state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-fun").toString
    val steps = Seq("view", "click", "purchase")
    // ts here is a legacy nanos long. u1 completes the funnel across
    // THREE drip files; u2's click arrives before its view (out of
    // order, still above watermark) and must pair once the view lands.
    writeOne(dir, "f1.parquet",
      Seq((1L, H / 10, "view"), (2L, H / 2, "click")).toDF("user_id", "ts", "event_type"))
    val (trigger, finish) = dripRig { q =>
      writeOne(dir, "f2.parquet",
        Seq((1L, H / 5, "click"), (2L, H / 4, "view")).toDF("user_id", "ts", "event_type"))
      q.processAllAvailable()
      writeOne(dir, "f3.parquet",
        Seq((1L, H * 3 / 10, "purchase"), (2L, H * 3, "view")).toDF("user_id", "ts", "event_type"))
    }
    val horizon = 4L * 3600 * 1000000 // micros
    val soaked = rows(Funnelize.userFunnels(spark, dir, "f*.parquet", steps,
      horizon, trigger = trigger, finish = finish).orderBy("user_id"))
    val oneShot = rows(Funnelize.userFunnels(spark, dir, "f*.parquet", steps,
      horizon).orderBy("user_id"))
    assert(soaked === oneShot)
    // micros = nanos/1000: u1 completes; u2 pairs view(0.25h)->click(0.5h)
    val us = H / 1000
    assert(soaked === Seq(
      Seq(1L, us / 10, us / 5, us * 3 / 10, 3L),
      Seq(2L, us / 4, us / 2, null, 2L)))
  }

  // epoch base clear of the zero initial watermark (transformWithState's
  // EventTime filter drops rows at-or-before the watermark)
  private val T0 = 1000000L * H / 3600L

  test("transformWithState debounce soak: dripped run equals one-shot state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-deb").toString
    val S = H / 3600L // one second in nanos
    def ev(id: Long, t: Long, u: Long) = (id, T0 + t, u, "click", 0.0)
    writeOne(dir, "f1.parquet",
      Seq(ev(1, 0, 1), ev(2, 7 * S, 1)).toDF(
        "event_id", "ts", "user_id", "event_type", "value"))
    val (trigger, finish) = dripRig { q =>
      // a LATE 4s event lands in its own batch: folds between 0 and 7
      writeOne(dir, "f2.parquet", Seq(ev(3, 4 * S, 1)).toDF(
        "event_id", "ts", "user_id", "event_type", "value"))
      q.processAllAvailable()
      writeOne(dir, "f3.parquet",
        Seq(ev(4, 20 * S, 1), ev(5, 0, 2)).toDF(
          "event_id", "ts", "user_id", "event_type", "value"))
    }
    val soaked = rows(Debounce.debouncedCounts(spark, dir, "f*.parquet",
      5000000L, trigger = trigger, finish = finish).orderBy("user_id"))
    val oneShot = rows(Debounce.debouncedCounts(spark, dir, "f*.parquet",
      5000000L).orderBy("user_id"))
    assert(soaked === oneShot)
    // u1: 0 kept, 4 dropped (≤5s of 0), 7 kept (>5s of 0), 20 kept
    assert(soaked === Seq(Seq(1L, "click", 3L, 1L), Seq(2L, "click", 1L, 0L)))
  }

  test("left-outer interval join soak: dripped run emits the same null rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-ssjo").toString
    val S = H / 3600L
    def ev(id: Long, t: Long, u: Long, ty: String, v: Double) =
      (id, T0 + t, u, ty, v)
    // u1: click with NO error ever → must surface with a null right
    // once the dripped flush finalizes the verdict; u2 pairs normally.
    writeOne(dir, "f1.parquet", Seq(
      ev(1, 600 * S, 1L, "click", 0.0),
      ev(2, 900 * S, 2L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    val (trigger, finish) = dripRig { q =>
      writeOne(dir, "f2.parquet", Seq(ev(3, 800 * S, 2L, "error", 5.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      q.processAllAvailable()
      writeOne(dir, "f3.parquet", Seq(
        ev(4, 100000 * S, -1L, "click", 0.0),
        ev(5, 100000 * S, -1L, "error", 0.0)
      ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    }
    val soaked = rows(Ingest.intervalJoinLeftOuterStream(spark, dir,
        "f*.parquet", "user_id", "click", "error",
        trigger = trigger, finish = finish)
      .filter(col("l_key") =!= -1L)
      .select("l_key", "r_value").orderBy("l_key"))
    val oneShot = rows(Ingest.intervalJoinLeftOuterStream(spark, dir,
        "f*.parquet", "user_id", "click", "error")
      .filter(col("l_key") =!= -1L)
      .select("l_key", "r_value").orderBy("l_key"))
    assert(soaked === oneShot)
    assert(soaked === Seq(Seq(1L, null), Seq(2L, 5.0)))
  }

  test("transformWithState sessions soak: timers close sessions mid-stream") {
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-tws").toString
    val S = H / 3600L
    def ev(id: Long, t: Long, u: Long) = (id, T0 + t, u, "view", 0.0)
    writeOne(dir, "f1.parquet",
      Seq(ev(1, 0, 1), ev(2, 10 * S, 1)).toDF(
        "event_id", "ts", "user_id", "event_type", "value"))
    val (trigger, finish) = dripRig { q =>
      // user 2's far event advances the watermark past u1's seal point
      // MID-STREAM: u1's session must emit from the timer while the
      // query keeps running
      writeOne(dir, "f2.parquet", Seq(ev(3, 5000 * S, 2))
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      q.processAllAvailable()
      // u1 comes back: a SECOND session after the first closed
      writeOne(dir, "f3.parquet", Seq(ev(4, 6000 * S, 1), ev(5, 99999 * S, 3))
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
    }
    val gap = 60000000L // 1 min
    val soaked = rows(SessionizeTws.closedSessions(spark, dir, "f*.parquet",
        gap, trigger = trigger, finish = finish)
      .filter(col("user_id") === 1L))
    val oneShot = rows(SessionizeTws.closedSessions(spark, dir, "f*.parquet", gap)
      .filter(col("user_id") === 1L))
    assert(soaked === oneShot)
    val usBase = T0 / 1000L
    val usS = 1000000L
    assert(soaked === Seq(
      Seq(1L, 1, usBase, usBase + 10 * usS, 2L),
      Seq(1L, 2, usBase + 6000 * usS, usBase + 6000 * usS, 1L)))
  }
}
