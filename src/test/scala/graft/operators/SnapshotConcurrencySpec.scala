package graft.operators

import graft.SparkSpec
import java.util.concurrent.{Callable, Executors, TimeUnit}

/** Concurrent-writer soak for the snapshot commit protocol: racing
  * threads drive real publishes against one destination and the final
  * state is checked against what a serial history must produce. The
  * CAS commit (build against the fresh base, check-and-rename into
  * slot latest+1, rebuild on a lost race) makes carry-forward commits
  * LOSSLESS — the property the old claim-then-commit protocol silently
  * violated: a loser there committed a manifest built against a stale
  * base, dropping the winner's delta with no error. Base-dependent
  * publishes (merge/compact) can't rebuild — their joins ran against
  * the stale base's files — so they abort with
  * [[Snapshot.ConcurrentSnapshotUpdate]] and the caller retries.
  *
  * Also pins the crash story: a publisher that dies between its
  * staging claim and its commit leaves NOTHING visible, the next
  * publish commits the very version number the crashed attempt
  * targeted, and [[Snapshot.vacuumOrphans]] reclaims the dead staging.
  */
class SnapshotConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("two racing appenders: every delta survives, versions contiguous") {
    val dest = java.nio.file.Files.createTempDirectory("graft-race-a").toString
    Snapshot.publishSnapshot(Seq((0L, "base")).toDF("k", "v"), dest)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val futures = (0 until 2).map { w =>
        pool.submit(new Callable[Unit] {
          def call(): Unit =
            (0 until 6).foreach { i =>
              Snapshot.appendSnapshot(
                Seq((1000L * (w + 1) + i, s"w$w-$i")).toDF("k", "v"), dest)
            }
        })
      }
      futures.foreach(_.get(300, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    val latest = Snapshot.latestVersion(spark, dest)
    assert(latest == 13,
      s"12 appends over a base must commit 13 contiguous versions, got $latest")
    val keys = Snapshot.readSnapshot(spark, dest, latest)
      .select("k").collect().map(_.getLong(0)).toSet
    val expect = Set(0L) ++
      (0 until 2).flatMap(w => (0 until 6).map(i => 1000L * (w + 1) + i))
    assert(keys == expect, s"lost deltas: missing ${expect -- keys}")
    // serializable history: each committed version extends the previous
    // by exactly its one-row delta, so version v holds v rows
    (1 to latest).foreach { v =>
      assert(Snapshot.readSnapshot(spark, dest, v).count() == v,
        s"version $v must hold $v rows")
    }
  }

  test("merges racing appends: conflicts abort retryably, nothing lost") {
    val dest = java.nio.file.Files.createTempDirectory("graft-race-m").toString
    Snapshot.publishSnapshot(Seq((0L, "m0"), (1L, "x")).toDF("k", "v"), dest,
      statsCol = Some("k"))
    def retry[T](f: => T): T = {
      var out: Option[T] = None
      var tries = 0
      while (out.isEmpty) {
        tries += 1
        require(tries <= 50, "too many conflict retries")
        try out = Some(f)
        catch { case _: Snapshot.ConcurrentSnapshotUpdate => () }
      }
      out.get
    }
    val pool = Executors.newFixedThreadPool(2)
    try {
      val appender = pool.submit(new Callable[Unit] {
        def call(): Unit =
          (0 until 5).foreach { i =>
            Snapshot.appendSnapshot(
              Seq((100L + i, s"a$i")).toDF("k", "v"), dest)
          }
      })
      val merger = pool.submit(new Callable[Unit] {
        def call(): Unit =
          (1 to 4).foreach { i =>
            retry(Snapshot.mergeSnapshot(
              Seq((0L, s"m$i")).toDF("k", "v"), dest, "k"))
            if (i % 2 == 0)
              retry(Snapshot.compactSnapshot(spark, dest, minRows = 2L,
                targetRows = 10000L))
          }
      })
      appender.get(300, TimeUnit.SECONDS)
      merger.get(300, TimeUnit.SECONDS)
    } finally pool.shutdownNow()
    val out = Snapshot.readSnapshot(spark, dest,
        Snapshot.latestVersion(spark, dest))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "m4", s"merge sequence lost: ${out(0L)}")
    assert(out(1L) == "x")
    (0 until 5).foreach(i =>
      assert(out.get(100L + i).contains(s"a$i"), s"append $i lost: $out"))
    assert(out.size == 7, s"unexpected rows: $out")
  }

  test("crashed publish: invisible, same slot reused, orphans reclaimed") {
    import java.nio.file.{Files, Paths}
    val dest = Files.createTempDirectory("graft-race-c").toString
    Snapshot.publishSnapshot(Seq((1L, "a")).toDF("k", "v"), dest)
    // a publisher that claimed staging id 2, staged data and its delta
    // manifest, and died before its CAS commit
    Files.write(Paths.get(s"$dest/manifest/.claim_v2"), Array.empty[Byte])
    Files.createDirectories(Paths.get(s"$dest/data/v2"))
    Files.write(Paths.get(s"$dest/data/v2/part-00000-dead.parquet"),
      Array[Byte](1, 2, 3))
    Files.write(Paths.get(s"$dest/manifest/d2.txt"),
      "data/v2/part-00000-dead.parquet".getBytes("UTF-8"))
    Files.write(Paths.get(s"$dest/manifest/.tmp_v2"),
      "#junk".getBytes("UTF-8"))
    // nothing committed
    assert(Snapshot.latestVersion(spark, dest) == 1)
    // the next append stages under the NEXT free id but commits the
    // same version number the crashed attempt targeted
    assert(Snapshot.appendSnapshot(Seq((2L, "b")).toDF("k", "v"), dest) == 2)
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    Thread.sleep(20)
    val n = Snapshot.vacuumOrphans(spark, dest, olderThanMs = 0L)
    assert(n >= 3, s"expected orphan dir + delta + tmp reclaimed, got $n")
    assert(!Files.exists(Paths.get(s"$dest/data/v2")))
    assert(!Files.exists(Paths.get(s"$dest/manifest/d2.txt")))
    assert(!Files.exists(Paths.get(s"$dest/manifest/.tmp_v2")))
    // committed versions untouched whatever their age
    assert(rows(Snapshot.readSnapshot(spark, dest, 2).orderBy("k")) ===
      Seq(Seq(1L, "a"), Seq(2L, "b")))
    // idempotent: a second pass finds nothing
    assert(Snapshot.vacuumOrphans(spark, dest, olderThanMs = 0L) == 0)
  }

  test("vacuum retention contract: dropped-version reads fail loudly") {
    val dest = java.nio.file.Files.createTempDirectory("graft-race-v").toString
    Snapshot.publishSnapshot(
      (0L until 100L).map(k => (k, s"n$k")).toDF("k", "v"), dest)
    Snapshot.publishSnapshot(Seq((9L, "z")).toDF("k", "v"), dest)
    // a reader that pinned v1 BEFORE the vacuum: its files are deleted
    // underneath, and the scan must fail loudly — data files are
    // immutable and never reused, so a vacuumed-under reader can error
    // but can never silently return wrong rows
    val pinned = Snapshot.readSnapshot(spark, dest, 1)
    Snapshot.vacuum(spark, dest, keepFrom = 2)
    intercept[Exception] { pinned.count() }
    // and re-resolving the dropped version refuses at the manifest
    intercept[Exception] { Snapshot.readSnapshot(spark, dest, 1).count() }
    // the kept version is complete
    assert(rows(Snapshot.readSnapshot(spark, dest, 2)) === Seq(Seq(9L, "z")))
  }
}
