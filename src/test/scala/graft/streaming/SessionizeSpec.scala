package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  test("stateful sessionization matches the batch window formulation") {
    val dir = "/root/testdata/sf0.001"
    val gap = 30L * 60 * 1000000000L
    val streamed = Sessionize.userSessions(spark, dir, "events.parquet", gap)
      .orderBy("user_id")
    val e = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val batch = e.withColumn("brk",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) > gap, 1L).otherwise(0L))
      .groupBy("user_id")
      .agg(sum(col("brk")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
    assert(rows(streamed) === rows(batch))
  }

  test("out-of-order events across micro-batches sessionize correctly") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val gap = 100L
    def ev(ts: Long) = Sessionize.Event(1L, ts, new java.sql.Timestamp(ts / 1000000))
    // Batch 1 (watermark 0): events at t=1000 and t=5000 — a naive fold
    // would close a session boundary between them (5000-1000 > gap).
    val s1 = TestGroupState.create[Sessionize.SessionState](
      optionalState = Optional.empty(), GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(0L),
      hasTimedOut = false)
    val out1 = Sessionize.sessionStep(gap)(1L, Iterator(ev(1000), ev(5000)), s1).toSeq
    assert(out1.head === Sessionize.UserSessions(1L, 2L, 2L, 1L)) // preview
    // Batch 2 delivers t=1050 — BETWEEN the two batch-1 events (late but
    // above watermark). With the buffer it chains 1000→1050, leaving
    // 5000 alone: still 2 sessions, 3 events. The pre-round-4 fold would
    // have compared 1050 against lastTs=5000 and undercounted.
    val s2 = TestGroupState.create[Sessionize.SessionState](
      optionalState = Optional.of(s1.get), GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(0L),
      hasTimedOut = false)
    val out2 = Sessionize.sessionStep(gap)(1L, Iterator(ev(1050)), s2).toSeq
    assert(out2.head === Sessionize.UserSessions(1L, 2L, 3L, 2L))
    // Batch 3: watermark passes everything → buffer finalizes, same totals.
    val s3 = TestGroupState.create[Sessionize.SessionState](
      optionalState = Optional.of(s2.get), GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(10L),
      hasTimedOut = false)
    val out3 = Sessionize.sessionStep(gap)(1L, Iterator.empty, s3).toSeq
    assert(out3.head === Sessionize.UserSessions(1L, 2L, 3L, 3L))
    assert(s3.get.pending.isEmpty) // state buffer drained, counts settled
    assert(s3.get.sessions === 2L && s3.get.events === 3L)
  }

  test("late bridging event across micro-batches: FINAL table row is last-wins") {
    import org.apache.spark.sql.functions._
    // Gap 2500ns. Batch 1 delivers {1000, 5000} → previews 2 sessions;
    // batch 2 delivers 3000, which BRIDGES them (1000→3000→5000, every
    // hop ≤ gap) → 1 session. A max(n_sessions) read-out would keep the
    // stale 2; the seq-based last-wins read-out must report 1.
    import java.nio.file.{Files => JF, Paths, StandardCopyOption}
    import java.nio.file.attribute.FileTime
    val dir = JF.createTempDirectory("graft-bridge").toString
    // Write each delivery as a single parquet FILE (pathGlobFilter matches
    // leaf names) with a pinned mtime — file-source batch order follows
    // modification time, so the bridging event genuinely arrives in a
    // LATER micro-batch.
    def writeOne(name: String, ts: Seq[Long], mtime: Long): Unit = {
      import spark.implicits._
      val stage = s"$dir/stage_$name"
      ts.map(t => (1L, t)).toDF("user_id", "ts")
        .coalesce(1).write.parquet(stage)
      val part = JF.list(Paths.get(stage)).iterator()
      val src = Iterator.continually(part)
        .takeWhile(_.hasNext).map(_.next())
        .find(_.getFileName.toString.startsWith("part-")).get
      val dst = Paths.get(s"$dir/$name")
      JF.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
      JF.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    writeOne("b1.parquet", Seq(1000L, 5000L), 1000000L)
    writeOne("b2.parquet", Seq(3000L), 2000000L)
    val out = Sessionize.userSessions(spark, dir, "b*.parquet",
      gapNanos = 2500L, maxFilesPerTrigger = 1)
    assert(rows(out) === Seq(Seq(1L, 1L, 3L)))
    // Prove the stale preview really existed in an earlier micro-batch
    // (i.e. the run was multi-batch and max() would have answered 2).
    val emitted = spark.table("graft_sessions")
      .select("n_sessions", "seq").orderBy("seq")
    assert(rows(emitted) === Seq(Seq(2L, 1L), Seq(1L, 2L)))
  }
}

class UpsertStreamSpec extends SparkSpec {

  test("foreachBatch MERGE commit is exactly-once across re-runs") {
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val src = "/root/testdata/sf0.001"
    val n1 = Ingest.upsertExactlyOnce(spark, src, "nation.parquet",
      s"$base/dest", s"$base/ckpt", Seq("n_nationkey"))
    val n2 = Ingest.upsertExactlyOnce(spark, src, "nation.parquet",
      s"$base/dest", s"$base/ckpt", Seq("n_nationkey"))
    val direct = spark.read.parquet(s"$src/nation.parquet").count()
    assert(n1 === direct && n2 === direct)
  }

  test("a crash mid-swap is repaired: complete staging applies, partial drops") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-recover").toString
    val src = s"$base/src"
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.parquet(src)
    Ingest.upsertExactlyOnce(spark, src, "part-*",
      s"$base/dest", s"$base/ckpt", Seq("n_nationkey"), nBuckets = 8)
    // Simulate a commit that died AFTER writing staging (with _SUCCESS)
    // but BEFORE swapping: one updated row for key 0, laid out exactly
    // as the foreachBatch writes it.
    val staged = spark.read.parquet(s"$base/dest")
      .filter(col("n_nationkey") === 0)
      .withColumn("n_name", lit("recovered"))
    staged.write.partitionBy("__bucket").parquet(s"$base/dest.staging")
    // parquet write emits _SUCCESS at the staging root → "complete"
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/dest.staging/_SUCCESS")))
    // Next run (no new input — the checkpoint makes the batch a no-op)
    // must finish the interrupted swap before reading.
    Ingest.upsertExactlyOnce(spark, src, "part-*",
      s"$base/dest", s"$base/ckpt", Seq("n_nationkey"), nBuckets = 8)
    val after = spark.read.parquet(s"$base/dest")
      .filter(col("n_nationkey") === 0).select("n_name")
    assert(rows(after).flatten === Seq("recovered"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/dest.staging")))
    // An INCOMPLETE staging dir (no _SUCCESS — a dead partial write)
    // must be dropped, not applied.
    val p = java.nio.file.Paths.get(s"$base/dest.staging/__bucket=0")
    java.nio.file.Files.createDirectories(p)
    java.nio.file.Files.write(p.resolve("part-zzz.parquet"), Array[Byte](1, 2))
    Ingest.upsertExactlyOnce(spark, src, "part-*",
      s"$base/dest", s"$base/ckpt", Seq("n_nationkey"), nBuckets = 8)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/dest.staging")))
    val still = spark.read.parquet(s"$base/dest")
      .filter(col("n_nationkey") === 0).select("n_name")
    assert(rows(still).flatten === Seq("recovered")) // garbage not applied
  }

  test("a micro-batch rewrites only the buckets its keys touch") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val src = s"$base/src"
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    nation.write.parquet(src)
    // Per-bucket file listing of the dest table (part-file names are
    // unique per write, so a rewritten bucket always shows new names).
    def listing: Map[String, Set[String]] = {
      val d = java.nio.file.Paths.get(s"$base/dest")
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.getFileName.toString.startsWith("__bucket="))
        .map { b =>
          b.getFileName.toString -> java.nio.file.Files.list(b).iterator()
            .asScala.map(_.getFileName.toString)
            .filter(_.startsWith("part-")).toSet
        }.toMap
    }
    val n1 = Ingest.upsertExactlyOnce(spark, src, "part-*",
      s"$base/dest", s"$base/ckpt", Seq("n_nationkey"), nBuckets = 8)
    val before = listing
    assert(before.size > 1) // 25 nations spread over several buckets
    // Second delivery: one updated row for one existing key.
    nation.filter(col("n_nationkey") === 0)
      .withColumn("n_name", lit("updated")).write.mode("append").parquet(src)
    val n2 = Ingest.upsertExactlyOnce(spark, src, "part-*",
      s"$base/dest", s"$base/ckpt", Seq("n_nationkey"), nBuckets = 8)
    val after = listing
    assert(n2 === n1) // MERGE on an existing key: no growth
    val changed = before.keySet.union(after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")
    val updated = spark.read.parquet(s"$base/dest")
      .filter(col("n_nationkey") === 0).select("n_name")
    assert(rows(updated).flatten === Seq("updated"))
  }
}

class IvfKnnSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("IVF probe finds most of the brute-force top-k, full probe all of it") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val exact = Similarity.bruteForceKnn(emb, "vec_id", "embedding", query, 10)
      .select("vec_id").as[Long].collect().toSet
    val fullProbe = Similarity.ivfKnn(emb, "vec_id", "embedding", query, 10,
      nCells = 8, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(fullProbe === exact) // probing every cell == brute force
    val partial = Similarity.ivfKnn(emb, "vec_id", "embedding", query, 10,
      nCells = 8, nProbe = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(partial.subsetOf(exact ++ partial)) // well-formed
    assert((partial & exact).size >= 3) // meaningful recall at 3/8 cells
  }
}

/** The on-disk IVF layout: cell-partitioned publish, probe-time
  * directory pruning asserted as a PLAN property (the PartitionPruneSpec
  * pattern applied to the ANN index), and result parity with the
  * in-memory probe over the same centroids. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("published index probe prunes to nProbe cell partitions, same answer") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val query = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val dest = java.nio.file.Files.createTempDirectory("graft_ivf_idx_").toString
    val cents = Similarity.ivfPublish(emb, "vec_id", "embedding", 8, dest)
    val probed = Similarity.ivfKnnIndexed(spark, dest, cents,
      "vec_id", "embedding", query, 10, nProbe = 3)
    // plan property: the cell predicate lands in PartitionFilters
    val plan = probed.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("cell"),
      s"probe cells must reach PartitionFilters, got '$pf':\n$plan")
    val got = probed.collect().map(_.getAs[Long]("vec_id")).toSet
    // physical property: the pruned scan itself reads fewer files than
    // the layout holds (probed's own metrics hide behind AQE's broadcast
    // stage, so the scan is executed standalone — same predicate, same
    // layout; collect() executes exactly this plan)
    val qv = query.select(col("qv").cast("array<double>"))
      .collect()(0).getSeq[Double](0)
    val cells = Similarity.ivfProbeCells(cents, qv, 3)
    val scanOnly = spark.read.parquet(dest)
      .filter(col("cell").isin(cells: _*))
    scanOnly.collect()
    val numFiles = scanOnly.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    val totalFiles = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dest))
      try s.filter(_.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    assert(numFiles >= 1 && numFiles < totalFiles,
      s"expected a pruned scan ($numFiles of $totalFiles files)")
    // result parity with the in-memory probe over the same centroids
    val inMem = Similarity.ivfKnn(emb, "vec_id", "embedding", query, 10,
      nCells = 8, nProbe = 3).select("vec_id").as[Long].collect().toSet
    assert(got === inMem)
  }
}

class EmbeddingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed near-dup pairs are a subset of exact, with real recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.embeddingNearDupExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Similarity.embeddingNearDupBucketed(
        emb, "vec_id", "embedding", 0.4, nPlanes = 2, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(bucketed.nonEmpty)
    assert(bucketed.subsetOf(exact))
    // SRP theory at cos≈0.4: P(2-plane agreement) ≈ (1-acos(0.4)/π)² ≈ 0.4
    // — the test corpus's similar pairs sit near the threshold, so expect
    // a meaningful but partial recall.
    assert(bucketed.size.toDouble / exact.size > 0.15)
  }

  test("banded SRP (OR-amplification) beats a single bucket on recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.embeddingNearDupExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // Same banding as the declared q_embdup: 8 bands × 4 planes —
    // expected recall 1-(1-p⁴)⁸ ≈ 0.75 at p≈0.63 (cos 0.4).
    val banded = Similarity.embeddingNearDupBucketed(
        emb, "vec_id", "embedding", 0.4, nPlanes = 32, dim = 64, bands = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(exact))
    assert(banded.size.toDouble / exact.size > 0.4)
  }

  test("adaptive-r banding stays a subset of exact with non-trivial recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.embeddingNearDupExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val auto = Similarity.embeddingNearDupAuto(
        emb, "vec_id", "embedding", 0.4, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(auto.subsetOf(exact))
    // n=500, occupancy 8 → r=6: per-band recall p^6 ≈ 0.06, OR over 8
    // bands ≈ 0.4 — the documented low-threshold decay; assert it stays
    // meaningfully above zero at this corpus size
    assert(auto.size.toDouble / exact.size > 0.15)
  }

  test("blocked all-pairs equi-join == naive exact, and plans no BNLJ/cartesian") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val naive = Similarity.embeddingNearDupExact(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    val blocked = Similarity.embeddingNearDupExactBlocked(
        emb, "vec_id", "embedding", 0.4, blocks = 8)
      .select("id_a", "id_b", "sim").as[(Long, Long, Double)].collect().toSet
    assert(naive.nonEmpty)
    assert(blocked === naive) // identical pairs AND identical sims
    val plan = Similarity.embeddingNearDupExactBlocked(
      emb, "vec_id", "embedding", 0.4, blocks = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"blocked all-pairs must stay an equi-join:\n$plan")
  }

  test("hashStratum is a fixed-size deterministic sample") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val s1 = Similarity.hashStratum(emb, "vec_id", 100)
      .select("vec_id").as[Long].collect().toSet
    val s2 = Similarity.hashStratum(emb, "vec_id", 100)
      .select("vec_id").as[Long].collect().toSet
    assert(s1.size === 100)
    assert(s1 === s2) // same ranking every run
    // replay the Knuth hash rank driver-side: same survivor set
    val all = emb.select("vec_id").as[Long].collect()
    val expected = all.sortBy(id => ((id * 2654435761L) % 4294967296L, id))
      .take(100).toSet
    assert(s1 === expected)
  }
}
