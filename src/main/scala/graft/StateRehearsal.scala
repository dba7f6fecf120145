package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the STATEFUL subsystems — snapshots and the
  * streaming MERGE/SCD2 runtimes — along the axes the per-query bench
  * can't see:
  *
  *  - `snapshot`: 100× FILE COUNT (not rows). Publish wall (footer-stats
  *    collection is per file), manifest-driven driver costs
  *    (filesForRange / filesForKey arithmetic), range-read pruning,
  *    per-file bloom publish, vacuum across many versions. The claim
  *    under test: every driver-side step stays METADATA-sized.
  *  - `merge`: upsertExactlyOnce per-batch wall at 1×/100× DEST size
  *    for a fixed delivered batch, at two bucket counts — the claim is
  *    per-batch I/O = O(touched buckets), so wall must track
  *    touched-bucket VOLUME (dest/buckets × buckets-hit), which is the
  *    bucket-count guidance: grow nBuckets with the catalog.
  *  - `scd2`: scd2Stream per-batch wall with closed history grown 100×
  *    (seeded directly in the dest layout) — the O(open+delta) claim:
  *    closed rows must not ride through the apply join.
  *
  * Usage: runMain graft.StateRehearsal <mode> [workDir], env
  * SPARK_GRAFT_CPUS (default 16). Prints one JSON line per measured
  * cell; results are transcribed to BASELINE.md.
  */
object StateRehearsal {
  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def cell(name: String, kv: (String, Any)*): Unit =
    println(kv.map {
      case (k, v: String) => s""""$k":"$v""""
      case (k, v: Double) => s""""$k":${"%.3f".format(v)}"""
      case (k, v) => s""""$k":$v"""
    }.mkString(s"""{"cell":"$name",""", ",", "}"))

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("snapshot")
    val work = args.lift(1).getOrElse("/tmp/graft_state_rehearsal")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.hadoop.fs.Path
    val fs = new Path(work).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(work), true)

    mode match {
      case "snapshot" => snapshot(spark, work)
      case "merge" => merge(spark, work)
      case "scd2" => scd2(spark, work)
      case "snapmerge" => snapmerge(spark, work)
      case "compact" => compact(spark, work)
      case "zorder" => zorder(spark, work)
      case "manifestscale" => manifestscale(spark, work)
      case "morscale" => morscale(spark, work)
      case "txnscale" => txnscale(spark, work)
      case "txnlogscale" => txnlogscale(spark, work)
      case "txncdcscale" => txncdcscale(spark, work)
      case "morfoldscale" => morfoldscale(spark, work)
      case "replayscan" => replayscan(spark, work)
      case "tablereplayscan" => tablereplayscan(spark, work)
      case "pointscale" => pointscale(spark, work)
      case "dmlscale" => dmlscale(spark, work)
      case "annrecall" => annrecall(spark)
    }
    spark.stop()
  }

  /** 2M rows held constant; the axis is files-per-version. */
  private def snapshot(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    val rows = 2000000L
    for (files <- Seq(8, 800)) {
      val dest = s"$work/snap_$files"
      // range-clustered files (the layout a sequence column naturally
      // has under append-style ingest) so footer stats can actually
      // prune; round-robin files would all overlap every range
      val df = spark.range(rows)
        .select(col("id").as("seq"),
          concat(lit("k"), col("id")).as("key"),
          (col("id") % 1000).as("payload"))
        .repartitionByRange(files, col("seq"))
      val (_, pubWall) = time(Snapshot.publishSnapshot(df, dest,
        statsCol = Some("seq")))
      // driver-side manifest arithmetic: range prune + a full read-back
      val (pruned, pruneWall) = time(
        Snapshot.filesForRange(spark, dest, 1, 0L, rows / files / 2))
      val (_, rangeWall) = time(
        Snapshot.readSnapshotRange(spark, dest, 1, 0L, 999L)
          .queryExecution.toRdd.count())
      cell("snapshot_stats", "files" -> files, "publish_sec" -> pubWall,
        "prune_driver_sec" -> pruneWall, "files_admitted" -> pruned.size,
        "range_read_sec" -> rangeWall)
      // bloom publish + point-lookup admit cost
      val destB = s"$work/snapbloom_$files"
      val (_, bloomWall) = time(
        Snapshot.publishSnapshotBloom(df, destB, "key"))
      val (admitted, admitWall) = time(
        Snapshot.filesForKey(spark, destB, 1, "k42"))
      val (_, pointWall) = time(
        Snapshot.readSnapshotPoint(spark, destB, 1, "k42")
          .queryExecution.toRdd.count())
      cell("snapshot_bloom", "files" -> files, "publish_sec" -> bloomWall,
        "admit_driver_sec" -> admitWall, "files_admitted" -> admitted.size,
        "point_read_sec" -> pointWall)
    }
    // vacuum across many versions: 20 REPLACEMENT publishes of 8 files
    // each (append-only manifests carry every old file forward, so an
    // append history legitimately vacuums to zero — replacements are
    // what leave dead files behind)
    val destV = s"$work/snap_vacuum"
    val base = spark.range(100000L).repartition(8)
      .select(col("id").as("seq"), concat(lit("k"), col("id")).as("key"),
        (col("id") % 1000).as("payload"))
    (0 to 19).foreach { i =>
      Snapshot.publishSnapshot(
        base.withColumn("seq", col("seq") + lit(i * 100000L)), destV,
        Some("seq"))
      ()
    }
    val (dropped, vacWall) = time(
      graft.operators.Snapshot.vacuum(spark, destV, keepFrom = 19))
    val (_, readWall) = time(
      graft.operators.Snapshot.readSnapshot(spark, destV, 20)
        .queryExecution.toRdd.count())
    cell("snapshot_vacuum", "versions" -> 20, "dropped_files" -> dropped,
      "vacuum_sec" -> vacWall, "read_latest_sec" -> readWall)
  }

  /** compactSnapshot: 20M-row table (long + 2 string cols, 8 big
    * files), axis = accreted small files (80 vs 800, one
    * snapshotStream-style batch each, 100 rows per file). The O(small
    * bytes) claim = compact wall tracks the small-file ROWS (8k vs
    * 80k — both a rounding error next to the table), and the
    * full-rewrite twin (publish of the whole read-back) shows what
    * O(table) would have cost. The table must dwarf the small set for
    * the comparison to mean anything: at a 2M-row toy size the twin
    * ties because BOTH costs are dominated by opening the small files.
    * Read-latest wall before/after shows the scan-health motivation. */
  private def compact(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    def shaped(d: org.apache.spark.sql.Dataset[java.lang.Long]) = d
      .select(col("id").as("seq"),
        concat(lit("payload_"), pmod(col("id"), lit(997))).as("p1"),
        concat(lit("body_"), col("id")).as("p2"))
    for (small <- Seq(80, 800)) {
      val dest = s"$work/compact_$small"
      val df = shaped(spark.range(20000000L))
        .repartitionByRange(8, col("seq"))
      Snapshot.publishSnapshot(df, dest, statsCol = Some("seq"))
      // the accretion, delivered as one append carrying `small` files
      // (the per-batch version churn is rehearsed in snapshotStream's
      // own spec; here the axis is the FILE COUNT compaction faces)
      val delta = shaped(spark.range(20000000L, 20000000L + small * 100L))
        .repartition(small)
      Snapshot.appendSnapshot(delta, dest, statsCol = Some("seq"))
      val (_, readBefore) = time(
        Snapshot.readSnapshot(spark, dest, 2).queryExecution.toRdd.count())
      val (vNew, compactWall) = time(
        Snapshot.compactSnapshot(spark, dest, minRows = 1000L,
          targetRows = 2500000L))
      val (_, readAfter) = time(
        Snapshot.readSnapshot(spark, dest, vNew)
          .queryExecution.toRdd.count())
      val filesAfter = Snapshot.filesForRange(spark, dest, vNew,
        Long.MinValue, Long.MaxValue).size
      // the O(table) twin: what a naive "rewrite everything" costs
      val destF = s"$work/compactfull_$small"
      val (_, fullWall) = time(Snapshot.publishSnapshot(
        Snapshot.readSnapshot(spark, dest, 2), destF,
        statsCol = Some("seq")))
      cell("snapshot_compact", "small_files" -> small,
        "compact_sec" -> compactWall, "full_rewrite_sec" -> fullWall,
        "files_before" -> (8 + small), "files_after" -> filesAfter,
        "read_before_sec" -> readBefore, "read_after_sec" -> readAfter)
    }
  }

  /** Z-ordered snapshot vs single-column stats vs full scan: 20M rows
    * over a 4096×4096 (a, b) grid, one small 2-D box probe (1/8 of each
    * dim = 1/64 of the area). The 1-D twin can only prune on a's range
    * (≥1/8 of files admitted however tight the b predicate); the
    * Z-ordered publish admits ~box-area + curve-boundary files. The
    * measured gap is the whole point of multi-dimension clustering. */
  private def zorder(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    val rows = 20000000L
    val df = spark.range(rows).select(
      (col("id") % 4096).as("a"),
      ((col("id") * 2654435761L) % 4096).as("b"),  // decorrelate dims
      col("id").as("payload"))
    val destZ = s"$work/zsnap"
    val (_, pubZ) = time(Snapshot.publishSnapshotZOrdered(
      df, destZ, "a", "b", bits = 12, nFiles = 64))
    val dest1 = s"$work/zsnap1d"
    val (_, pub1) = time(Snapshot.publishSnapshot(
      df.repartitionByRange(64, col("a")), dest1, statsCol = Some("a")))
    val (admitZ, admitZWall) = time(
      Snapshot.filesForBox(spark, destZ, 1, 1024, 1535, 2048, 2559))
    val (admit1, _) = time(
      Snapshot.filesForRange(spark, dest1, 1, 1024, 1535))
    val (nZ, wallZ) = time(
      Snapshot.readSnapshotBox(spark, destZ, 1, 1024, 1535, 2048, 2559)
        .queryExecution.toRdd.count())
    val (n1, wall1) = time(
      Snapshot.readSnapshotRange(spark, dest1, 1, 1024, 1535)
        .filter(col("b").between(2048, 2559))
        .queryExecution.toRdd.count())
    val (nF, wallF) = time(
      Snapshot.readSnapshot(spark, destZ, 1)
        .filter(col("a").between(1024, 1535) && col("b").between(2048, 2559))
        .queryExecution.toRdd.count())
    require(nZ == n1 && n1 == nF, s"row mismatch: z=$nZ 1d=$n1 full=$nF")
    // the scale metric is ROWS/BYTES OPENED (what 100 TB bills for) —
    // wall at this in-cache size is task-parallelism-bound, not IO-bound
    val scannedZ = spark.read
      .parquet(admitZ.map(f => s"$destZ/$f"): _*).count()
    val scanned1 = spark.read
      .parquet(admit1.map(f => s"$dest1/$f"): _*).count()
    cell("snapshot_zorder", "rows" -> rows, "files" -> 64,
      "publish_z_sec" -> pubZ, "publish_1d_sec" -> pub1,
      "admit_z" -> admitZ.size, "admit_1d" -> admit1.size,
      "scanned_rows_z" -> scannedZ, "scanned_rows_1d" -> scanned1,
      "admit_driver_sec" -> admitZWall,
      "box_read_z_sec" -> wallZ, "box_read_1d_sec" -> wall1,
      "full_scan_sec" -> wallF, "box_rows" -> nZ)
  }

  /** Fixed-size delivered batch; axes are dest size × how many of the
    * 16 buckets the batch's keys hash into (4 vs all). The O(touched
    * buckets) claim = wall tracks (dest/buckets)·touched, so the
    * narrow batch must stay cheap as dest grows 100× while the
    * scattered batch pays the full-catalog rewrite. A 120-byte payload
    * makes the rewrite volume visible over the streaming runtime's
    * fixed ~4-5 s machinery cost. */
  private def merge(spark: SparkSession, work: String): Unit = {
    import graft.streaming.Ingest
    val buckets = 16
    // warm-up: absorb stream-machinery class loading so the first
    // measured cell isn't inflated
    locally {
      spark.range(100L).select(col("id").as("key"), lit(0L).as("ver"),
        lit("w").as("payload"), pmod(hash(col("id")), lit(buckets)).as("__bucket"))
        .write.partitionBy("__bucket").parquet(s"$work/merge_warm_dest")
      spark.range(10L).select(col("id").as("key"), lit(1L).as("ver"),
        lit("w").as("payload")).write.parquet(s"$work/merge_warm_src")
      Ingest.upsertExactlyOnce(spark, s"$work/merge_warm_src", "*.parquet",
        s"$work/merge_warm_dest", s"$work/merge_warm_ckpt", Seq("key"),
        nBuckets = buckets, tieBreak = Seq("ver"))
      ()
    }
    val pad = lpad(lit("x"), 120, "x")
    for (destRows <- Seq(200000L, 20000000L); narrow <- Seq(true, false)) {
      val tag = s"${destRows}_$narrow"
      val src = s"$work/merge_src_$tag"
      val dest = s"$work/merge_dest_$tag"
      val ckpt = s"$work/merge_ckpt_$tag"
      spark.range(destRows)
        .select(col("id").as("key"), lit(0L).as("ver"), pad.as("payload"),
          pmod(hash(col("id")), lit(buckets)).as("__bucket"))
        .write.partitionBy("__bucket").parquet(dest)
      // narrow: only keys hashing into buckets 0-3 (touched = 4/16);
      // scattered: any keys (touched = 16/16). Same delivered row count.
      val keys = spark.range(destRows)
        .select(col("id").as("key"))
        .filter(lit(!narrow) ||
          pmod(hash(col("key")), lit(buckets)) < 4)
        .limit(50000)
      keys.select(col("key"), lit(1L).as("ver"), pad.as("payload"))
        .write.parquet(src)
      val (_, wall) = time(Ingest.upsertExactlyOnce(spark, src, "*.parquet",
        dest, ckpt, Seq("key"), nBuckets = buckets, tieBreak = Seq("ver")))
      cell("merge_batch", "dest_rows" -> destRows,
        "touched_buckets" -> (if (narrow) 4 else buckets),
        "batch_sec" -> wall)
    }
  }

  /** mergeSnapshot (copy-on-write MERGE INTO): fixed 10k-row update
    * batch in a narrow key range; axis is BASE size (rows and files,
    * 10× apart), key-clustered with stats on the key. The O(touched +
    * updates) claim has two parts: (a) touched-file DISCOVERY must not
    * scan the table — the stats fast path prunes candidates to the
    * update batch's key range before any data is read, so discovery
    * cost tracks the range, not the base; (b) the rewrite touches only
    * files containing an updated key. A near-flat wall across the 10×
    * base — against a visibly-growing unclustered control (stats on a
    * column ≠ merge key forces the full key-column scan) — is the
    * evidence. Also measured: the streaming producer's append commit
    * as the version/file count grows (manifest rewrite is O(total
    * files) text — the constant matters). */
  /** Merge-on-read vs copy-on-write under a stream of SCATTERED small
    * update batches — the workload MoR exists for. Same base, same 10
    * batches whose keys stride the whole key space (every batch touches
    * most files): COW pays touched-file rewrite per merge; MoR commits
    * O(batch) per merge and pays once at read (resolve join) and once
    * at reconcile. Measured: total commit wall both paths, resolved-read
    * vs plain-read wall, reconcile wall, post-reconcile read wall. */
  private def morscale(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    locally { // warm-up
      val d = s"$work/mor_warm"
      Snapshot.publishSnapshot(spark.range(1000L)
        .select(col("id").as("k"), lit("w").as("payload")), d,
        statsCol = Some("k"))
      Snapshot.mergeSnapshotMoR(spark.range(5L)
        .select(col("id").as("k"), lit("u").as("payload")), d, "k")
      Snapshot.reconcileSnapshotMoR(spark, d)
      ()
    }
    for (scale <- Seq(1, 5)) {
      val rows = 2000000L * scale
      val files = 64 * scale
      def base = spark.range(rows)
        .select(col("id").as("k"), (col("id") % 97).as("grp"),
          lpad(lit("x"), 120, "x").as("payload"))
        .repartitionByRange(files, col("k"))
      def batchOf(i: Int) = spark.range(1000L)
        .select(((col("id") * (rows / 1009L) + i) % rows).as("k"),
          lit(-1L).as("grp"), lit(s"upd$i").as("payload"))
        .distinct()
      val nBatches = 10
      // copy-on-write lane
      val cowDir = s"$work/mor_cow_$scale"
      Snapshot.publishSnapshot(base, cowDir, statsCol = Some("k"))
      val (_, cowCommits) = time(
        (0 until nBatches).foreach(i =>
          Snapshot.mergeSnapshot(batchOf(i), cowDir, "k")))
      val (_, cowRead) = time(
        Snapshot.readSnapshot(spark, cowDir,
          Snapshot.latestVersion(spark, cowDir))
          .queryExecution.toRdd.count())
      // merge-on-read lane
      val morDir = s"$work/mor_mor_$scale"
      Snapshot.publishSnapshot(base, morDir, statsCol = Some("k"))
      val (_, morCommits) = time(
        (0 until nBatches).foreach(i =>
          Snapshot.mergeSnapshotMoR(batchOf(i), morDir, "k")))
      val (_, morRead) = time(
        Snapshot.readSnapshot(spark, morDir,
          Snapshot.latestVersion(spark, morDir))
          .queryExecution.toRdd.count())
      val (_, reconcile) = time(Snapshot.reconcileSnapshotMoR(spark, morDir))
      val (_, postRead) = time(
        Snapshot.readSnapshot(spark, morDir,
          Snapshot.latestVersion(spark, morDir))
          .queryExecution.toRdd.count())
      cell("morscale", "base_rows" -> rows, "base_files" -> files,
        "batches" -> nBatches, "batch_rows" -> 1000,
        "cow_commits_sec" -> cowCommits, "mor_commits_sec" -> morCommits,
        "cow_read_sec" -> cowRead, "mor_read_sec" -> morRead,
        "reconcile_sec" -> reconcile, "post_reconcile_read_sec" -> postRead)
    }
  }

  /** Multi-table transaction cost anatomy vs base-table size — the
    * claim under test: STAGING is each table's ordinary append cost
    * (O(delta + versions), independent of base bytes), and the commit
    * point + finalization are METADATA-sized (one txn-manifest publish
    * + K pending renames — flat however big the tables grow). Measured
    * at 1× and 20× base size for a 3-table transaction with a fixed
    * delta. */
  private def txnscale(spark: SparkSession, work: String): Unit = {
    import graft.operators.{Snapshot, SnapshotTxn}
    locally { // warm-up
      val d = s"$work/txn_warm"
      Snapshot.publishSnapshot(spark.range(100L)
        .select(col("id").as("k"), lit("w").as("v")), d)
      val t = SnapshotTxn.begin(spark, s"$work/txn_warm_root")
      t.stageAppend(spark.range(5L)
        .select((col("id") + 1000L).as("k"), lit("x").as("v")), d)
      t.commit(); ()
    }
    for (scale <- Seq(1, 20)) {
      val rows = 500000L * scale
      val files = 16 * scale
      val root = s"$work/txn_root_$scale"
      val dests = (0 until 3).map(i => s"$work/txn_t${i}_$scale")
      dests.foreach { d =>
        Snapshot.publishSnapshot(spark.range(rows)
          .select(col("id").as("k"), (col("id") % 97).as("grp"),
            lpad(lit("x"), 120, "x").as("payload"))
          .repartitionByRange(files, col("k")), d, statsCol = Some("k"))
      }
      def delta(i: Int) = spark.range(1000L)
        .select((col("id") + rows + i * 10000L).as("k"),
          lit(-1L).as("grp"), lit(s"d$i").as("payload"))
      val txn = SnapshotTxn.begin(spark, root)
      val (_, stageSec) = time(
        dests.zipWithIndex.foreach { case (d, i) =>
          txn.stageAppend(delta(i), d) })
      // the commit point + finalize, isolated via the kill seam + recover
      val (_, commitSec) = time(txn.commitNoFinalize())
      val (_, finalizeSec) = time(SnapshotTxn.recover(spark, root))
      val (_, readSec) = time(
        SnapshotTxn.readLatest(spark, root, dests.head)
          .queryExecution.toRdd.count())
      cell("txnscale", "base_rows" -> rows, "base_files" -> files,
        "tables" -> 3, "delta_rows" -> 1000,
        "stage_sec" -> stageSec, "commit_point_sec" -> commitSec,
        "finalize_sec" -> finalizeSec, "read_sec" -> readSec)
    }
  }

  /** Txn-LOG growth: readLatest cost as the number of committed
    * transactions grows 100× (10² → 10⁴). The claim under test: the
    * recovered-through watermark makes the per-read recovery scan
    * O(new txns), so a WARM readLatest is FLAT in total log size; the
    * COLD catch-up pass (marker absent — a fresh driver on an old log)
    * is the one O(all txns) scan and is measured separately. The log is
    * fabricated directly in the manifest layout (every txn already
    * finalized — each scan step is the exists + no-op-finalize cost a
    * real recovered txn pays), which is what lets 10⁴ txns be staged in
    * seconds. */
  private def txnlogscale(spark: SparkSession, work: String): Unit = {
    import graft.operators.{Snapshot, SnapshotTxn}
    import org.apache.hadoop.fs.Path
    val fs = new Path(work).getFileSystem(spark.sessionState.newHadoopConf())
    for (n <- Seq(100, 1000, 10000)) {
      val dest = s"$work/txnlog_t_$n"
      val root = s"$work/txnlog_root_$n"
      Snapshot.publishSnapshot(spark.range(1000L)
        .select(col("id").as("k"), lit("x").as("v")), dest)
      fs.mkdirs(new Path(s"$root/manifest"))
      (1 to n).foreach { k =>
        val out = fs.create(new Path(s"$root/manifest/v$k.txt"), true)
        out.write(s"#txn=1\n$dest\t1\t1".getBytes("UTF-8"))
        out.close()
      }
      val (_, coldSec) = time(
        SnapshotTxn.readLatest(spark, root, dest)
          .queryExecution.toRdd.count())
      val (_, warmSec) = time(
        SnapshotTxn.readLatest(spark, root, dest)
          .queryExecution.toRdd.count())
      // warm again after one more txn lands: the steady-state shape
      val t = SnapshotTxn.begin(spark, root)
      t.stageAppend(spark.range(10L)
        .select((col("id") + 5000L).as("k"), lit("y").as("v")), dest)
      t.commit()
      val (_, steadySec) = time(
        SnapshotTxn.readLatest(spark, root, dest)
          .queryExecution.toRdd.count())
      cell("txnlogscale", "txns" -> n,
        "cold_catchup_sec" -> coldSec, "warm_read_sec" -> warmSec,
        "steady_read_sec" -> steadySec)
    }
  }

  /** Txn-CDC pump cost vs TOTAL log size. The claim under test (the
    * round-13 weak spot): a caught-up consumer's pump folds only the
    * WINDOW's manifests onto the checkpoint-cached (table → version)
    * snapshot — O(new txns) — so pumping 10 fresh txns must cost the
    * same over a 10²-txn and a 10⁴-txn log. The pre-fix behavior
    * refolded from txn 1 on every window (O(total) per pump) and
    * hard-failed outright once the prefix was vacuumed; the cell pumps
    * across a pruned prefix to pin both. The bootstrap pump (one full
    * fold) is reported separately — it is the one O(total) pass. */
  private def txncdcscale(spark: SparkSession, work: String): Unit = {
    import graft.operators.{Snapshot, SnapshotTxn, SnapshotTxnCdc}
    import org.apache.hadoop.fs.Path
    val fs = new Path(work).getFileSystem(spark.sessionState.newHadoopConf())
    for (n <- Seq(100, 1000, 10000)) {
      val dest = s"$work/txncdc_t_$n"
      val root = s"$work/txncdc_root_$n"
      val ckp = s"$work/txncdc_ckp_$n"
      Snapshot.publishSnapshot(spark.range(1000L)
        .select(col("id").as("k"), lit("x").as("v")), dest)
      fs.mkdirs(new Path(s"$root/manifest"))
      (1 to n).foreach { k =>
        val out = fs.create(new Path(s"$root/manifest/v$k.txt"), true)
        out.write(s"#txn=1\n$dest\t1\t1".getBytes("UTF-8"))
        out.close()
      }
      // bootstrap: the one full-fold pass, O(total log)
      val (_, bootSec) = time(
        SnapshotTxnCdc.pump(spark, root, ckp)(_ => ()))
      // 10 fresh one-table txns, then ONE caught-up pump over them:
      // must be flat across 100× total-log growth
      (1 to 10).foreach { i =>
        val t = SnapshotTxn.begin(spark, root)
        t.stageAppend(spark.range(10L)
          .select((col("id") + 100000L * i).as("k"), lit("y").as("v")),
          dest)
        t.commit()
      }
      val (w1, warmSec) = time(
        SnapshotTxnCdc.pump(spark, root, ckp, maxTxnsPerBatch = 1) {
          d => d.tables.foreach(_._2.queryExecution.toRdd.count()) })
      // prune the whole consumed prefix; the next pump must still work
      SnapshotTxn.vacuumTxnLog(spark, root, keepFrom = n + 11)
      val t = SnapshotTxn.begin(spark, root)
      t.stageAppend(spark.range(10L)
        .select((col("id") + 9999999L).as("k"), lit("z").as("v")), dest)
      t.commit()
      val (w2, prunedSec) = time(
        SnapshotTxnCdc.pump(spark, root, ckp, maxTxnsPerBatch = 1) {
          d => d.tables.foreach(_._2.queryExecution.toRdd.count()) })
      cell("txncdcscale", "txns" -> n,
        "bootstrap_pump_sec" -> bootSec,
        "caught_up_10txn_pump_sec" -> warmSec, "windows" -> w1,
        "post_prune_pump_sec" -> prunedSec, "pruned_windows" -> w2)
    }
  }

  /** The streaming replay watermark's probe cost
    * ([[graft.operators.SnapshotTxn.lastTagged]] — the r15 guard that
    * replaced the head-only tag check) vs the depth foreign txns bury
    * the batch tag. Claims: (a) the steady state is O(1) — the
    * stream's own commit IS the head, one manifest read; (b) a tag
    * buried under F foreign txns costs O(F) driver manifest reads —
    * linear, metadata-sized, bounded by vacuum; (c) after a vacuum
    * prunes the tag's carrier, the probe resolves from the fold
    * snapshot's `#tagwm=` watermark at O(1) regardless of how much was
    * pruned. Txn manifests are hand-written pointing at the table's
    * already-latest version (the txncdcscale trick) so the cell times
    * ONLY the metadata protocol, no Spark jobs. */
  private def replayscan(spark: SparkSession, work: String): Unit = {
    import graft.operators.{Snapshot, SnapshotTxn}
    import org.apache.hadoop.fs.Path
    val fs = new Path(work).getFileSystem(spark.sessionState.newHadoopConf())
    def writeTxn(root: String, k: Int, dest: String,
                 tag: Option[String]): Unit = {
      val out = fs.create(new Path(s"$root/manifest/v$k.txt"), true)
      out.write((Seq("#txn=1") ++ tag.map(t => s"#tag=$t") ++
        Seq(s"$dest\t1\t1")).mkString("\n").getBytes("UTF-8"))
      out.close()
    }
    for (f <- Seq(10, 100, 1000)) {
      val root = s"$work/replay_root_$f"
      val dest = s"$work/replay_t_$f"
      Snapshot.publishSnapshot(spark.range(100L)
        .select(col("id").as("k"), lit("x").as("v")), dest)
      fs.mkdirs(new Path(s"$root/manifest"))
      // the stream's tag at txn 1, buried under f foreign txns
      writeTxn(root, 1, dest, Some("batch=0"))
      (2 to f + 1).foreach(k => writeTxn(root, k, dest, None))
      val (b0, buriedSec) = time(
        SnapshotTxn.lastTagged(spark, root, "batch="))
      require(b0.contains("batch=0"), s"buried probe read $b0")
      // steady state: the stream's own commit is the head — O(1)
      writeTxn(root, f + 2, dest, Some("batch=1"))
      val (h0, headSec) = time(
        SnapshotTxn.lastTagged(spark, root, "batch="))
      require(h0.contains("batch=1"), s"head probe read $h0")
      // bury again, then prune the carrier: the fold snapshot's
      // watermark answers at O(1)
      SnapshotTxn.recover(spark, root)
      SnapshotTxn.vacuumTxnLog(spark, root,
        keepFrom = SnapshotTxn.latestTxn(spark, root))
      (f + 3 to 2 * f + 2).foreach(k => writeTxn(root, k, dest, None))
      SnapshotTxn.recover(spark, root)
      SnapshotTxn.vacuumTxnLog(spark, root,
        keepFrom = SnapshotTxn.latestTxn(spark, root))
      val (s0, prunedSec) = time(
        SnapshotTxn.lastTagged(spark, root, "batch="))
      require(s0.contains("batch=1"), s"post-prune probe read $s0")
      cell("replayscan", "foreign" -> f,
        "buried_probe_sec" -> buriedSec,
        "head_probe_sec" -> headSec,
        "post_prune_probe_sec" -> prunedSec)
    }
  }

  /** The TABLE-level replay guard's cost model (the txn replayscan's
    * twin, r16): [[graft.streaming.Ingest.lastBatchTag]]'s downward
    * scan is O(untagged maintenance commits since the stream's last
    * batch) — normally ZERO extra (the stream's own commit is the
    * head) — and after vacuum prunes the tag carrier the
    * `manifest/batchwm.txt` watermark answers FLAT regardless of
    * prune depth. */
  private def tablereplayscan(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    import graft.streaming.Ingest
    import org.apache.hadoop.fs.Path
    val fs = new Path(work).getFileSystem(spark.sessionState.newHadoopConf())
    for (f <- Seq(10, 100, 1000)) {
      val dest = s"$work/treplay_$f"
      Snapshot.publishSnapshot(spark.range(100L)
          .select(col("id").as("k"), lit("x").as("v")), dest,
        tag = Some("batch=0"))
      val dataLine = Snapshot.manifestLines(spark, dest, 1).head
      // untagged maintenance manifests fabricated at file speed (a real
      // compact per version would measure parquet IO, not the scan)
      def writeVer(k: Int, tag: Option[String]): Unit = {
        val out = fs.create(new Path(s"$dest/manifest/v$k.txt"), true)
        out.write((tag.map(t => s"#tag=$t").toSeq :+ dataLine)
          .mkString("\n").getBytes("UTF-8"))
        out.close()
      }
      (2 to f + 1).foreach(writeVer(_, None))
      val (b0, buriedSec) = time(Ingest.lastBatchTag(spark, dest))
      require(b0.contains(0L), s"buried probe read $b0")
      // steady state: the stream's own commit is the head — O(1)
      writeVer(f + 2, Some("batch=1"))
      val (h0, headSec) = time(Ingest.lastBatchTag(spark, dest))
      require(h0.contains(1L), s"head probe read $h0")
      // bury again, then prune ACROSS the carrier: the batchwm
      // watermark answers flat however deep the pruned region is
      (f + 3 to 2 * f + 2).foreach(writeVer(_, None))
      Snapshot.vacuum(spark, dest,
        keepFrom = Snapshot.latestVersion(spark, dest))
      val (s0, prunedSec) = time(Ingest.lastBatchTag(spark, dest))
      require(s0.contains(1L), s"post-prune probe read $s0")
      cell("tablereplayscan", "maintenance" -> f,
        "buried_probe_sec" -> buriedSec,
        "head_probe_sec" -> headSec,
        "post_prune_probe_sec" -> prunedSec)
    }
  }

  /** MoR log fold vs accumulated commit count. Claims: (a) the
    * resolve tax a reader pays grows with ACCUMULATED commits (the
    * per-key-max broadcast spans every generation), (b) one
    * compactSnapshotMoRLog bounds it back to the live-update set
    * WITHOUT touching base files, so the post-fold read is flat
    * whether 10 or 100 commits accumulated, and (c) the fold itself
    * costs O(log bytes), not O(table). */
  private def morfoldscale(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    for (k <- Seq(10, 100)) {
      val dest = s"$work/morfold_$k"
      Snapshot.publishSnapshot(spark.range(2000000L)
        .select(col("id").as("key"), (col("id") * 3).as("v"))
        .repartitionByRange(8, col("key")), dest,
        statsCol = Some("key"))
      (1 to k).foreach { i =>
        Snapshot.mergeSnapshotMoR(spark.range(200L)
          .select(((col("id") * 9973 + i) % 2000000L).as("key"),
            lit(-1L).as("v")).coalesce(1), dest, "key")
      }
      val latest = Snapshot.latestVersion(spark, dest)
      val (_, taxedSec) = time(
        Snapshot.readSnapshot(spark, dest, latest)
          .queryExecution.toRdd.count())
      val (_, foldSec) = time(Snapshot.compactSnapshotMoRLog(spark, dest))
      val (_, foldedSec) = time(
        Snapshot.readSnapshot(spark, dest,
          Snapshot.latestVersion(spark, dest))
          .queryExecution.toRdd.count())
      cell("morfoldscale", "commits" -> k,
        "resolved_read_sec" -> taxedSec, "fold_sec" -> foldSec,
        "post_fold_read_sec" -> foldedSec)
    }
  }

  /** MoR-aware point lookups at file-count scale. The 100 TB design
    * rule under test: FILE SIZE (keys per file) is held constant and
    * the table grows by file COUNT, with each file's bloom sized to
    * its keys (~13 bits/key here) — then a point read opens O(1)
    * admitting files at ANY table size, and the live upsert/delete log
    * adds only its own batch-sized generations. A bloom SMALLER than
    * its file saturates (nearly every file admits — measured and
    * reported as the anti-pattern cell) — per-file mBits is a
    * keys-per-file decision, not a table-size one. */
  private def pointscale(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    val keysPerFile = 2500L
    for (files <- Seq(8, 800)) {
      val rows = keysPerFile * files
      val dest = s"$work/point_$files"
      Snapshot.publishSnapshotIndexed(
        spark.range(rows).select(col("id").as("k"),
            lpad(lit("x"), 64, "x").as("payload"))
          .repartitionByRange(files, col("k")),
        dest, Seq("k"), "k", mBits = 32760, k = 4)
      // a 200-key upsert + a 100-key delete, log left UNreconciled
      Snapshot.mergeSnapshotMoR(
        spark.range(200L).select((col("id") * (rows / 211L)).as("k"),
          lit("upd").as("payload")), dest, "k")
      Snapshot.deleteSnapshotMoR(
        spark.range(100L).select((col("id") * (rows / 101L) + 1L).as("k")),
        dest, "k")
      def look(key: Long): Double = {
        val (_, s) = time(
          Snapshot.readSnapshotPoint(spark, dest, 3, key.toString)
            .queryExecution.toRdd.count())
        s
      }
      look(12347L) // warm the reader path
      val m = Snapshot.manifestLines(spark, dest, 3).size
      cell("pointscale", "files" -> m, "rows" -> rows,
        "base_key_sec" -> look(rows / 3 + 7),
        "upserted_key_sec" -> look((rows / 211L) * 7),
        "deleted_key_sec" -> look((rows / 101L) * 9 + 1))
    }
    // the ANTI-PATTERN cell: same 800-file table, bloom 13× too small
    // for its files — saturation admits ~everything and the lookup
    // degrades toward a full scan. (The publish DEFAULT is now
    // auto-sized to the largest file, so hitting this requires an
    // explicit undersized mBits — exactly what this cell passes.)
    locally {
      val files = 800
      val rows = keysPerFile * files
      val dest = s"$work/point_sat"
      Snapshot.publishSnapshotIndexed(
        spark.range(rows).select(col("id").as("k"),
            lpad(lit("x"), 64, "x").as("payload"))
          .repartitionByRange(files, col("k")),
        dest, Seq("k"), "k", mBits = 4032) // ~1.6 bits/key: saturated
      val (_, s) = time(
        Snapshot.readSnapshotPoint(spark, dest, 1, (rows / 3 + 7).toString)
          .queryExecution.toRdd.count())
      cell("pointscale_saturated", "files" -> files,
        "lookup_sec" -> s)
    }
  }

  /** Predicate DML + change-feed cost anatomy at file-count scale —
    * the claims: deleteWhere/updateWhere scan O(pruned files) (wall
    * tracks the predicate's stats-range, not the table), and
    * changeFeed reads O(changed files) however long the history. The
    * unpruned lane (predicate on a NON-stats column) is the same
    * operation without the bounds fold — the gap is the pruning. */
  private def dmlscale(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    locally { // warm-up
      val d = s"$work/dml_warm"
      Snapshot.publishSnapshot(spark.range(1000L)
        .select(col("id").as("k"), (col("id") % 7).as("x"),
          lit("w").as("v")), d, statsCol = Some("k"))
      Snapshot.deleteSnapshotMoRWhere(spark, d, "k",
        col("k") < 5L && col("x") === 1L)
      ()
    }
    val rows = 8000000L
    val files = 256
    def mkBase(d: String): Unit =
      Snapshot.publishSnapshot(spark.range(rows)
        .select(col("id").as("k"), (col("id") % 1000L).as("x"),
          lpad(lit("x"), 120, "x").as("payload"))
        .repartitionByRange(files, col("k")), d, statsCol = Some("k"))
    // pruned lane: conjunct on the stats column bounds ~1/256 of files
    val dP = s"$work/dml_pruned"; mkBase(dP)
    val span = rows / files
    val (_, prunedSec) = time(Snapshot.deleteSnapshotMoRWhere(spark, dP,
      "k", col("k") >= 10L * span && col("k") < 11L * span &&
        col("x") % 3L === 0L))
    // unpruned lane: same match COUNT, predicate invisible to stats
    val dU = s"$work/dml_unpruned"; mkBase(dU)
    val (_, unprunedSec) = time(Snapshot.deleteSnapshotMoRWhere(spark, dU,
      "k", col("x") === 123L)) // ~rows/1000 matches, every file scanned
    // updateWhere, pruned
    val dUp = s"$work/dml_upd"; mkBase(dUp)
    val (_, updSec) = time(Snapshot.updateSnapshotMoRWhere(spark, dUp,
      "k", col("k") >= 10L * span && col("k") < 11L * span,
      Map("payload" -> lit("u"))))
    // changeFeed across 30 one-batch commits on a big base: wall must
    // track the CHANGED bytes, not the base
    val dC = s"$work/dml_cdf"; mkBase(dC)
    (0 until 30).foreach(i =>
      Snapshot.mergeSnapshotMoR(spark.range(200L)
        .select((col("id") + rows + i * 1000L).as("k"), lit(0L).as("x"),
          lit(s"c$i").as("payload")), dC, "k"))
    val (_, cdfSec) = time(
      Snapshot.changeFeed(spark, dC, 1,
        Snapshot.latestVersion(spark, dC))
        .queryExecution.toRdd.count())
    cell("dmlscale", "base_rows" -> rows, "base_files" -> files,
      "delete_pruned_sec" -> prunedSec,
      "delete_unpruned_sec" -> unprunedSec,
      "update_pruned_sec" -> updSec,
      "cdf_commits" -> 30, "cdf_read_sec" -> cdfSec)
  }

  /** Recall@10 of every deployable ANN config vs brute-force cosine —
    * the similarity-search twin of the near-dup recall scorecard: each
    * approximate path is oracle-gated for CORRECTNESS of its declared
    * semantics, this measures how much of the exact answer the
    * approximation keeps, averaged over 32 query vectors spread across
    * the corpus. Configs are the GATE configs (IvfCells=16/nProbe=4,
    * int8 SQ, PQ M=4/K=8, SRP-bucket LSH 8 planes). */
  private def annrecall(spark: SparkSession): Unit = {
    import graft.operators.{Similarity, Pq}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .persist()
    val ids = emb.select("vec_id").orderBy("vec_id")
      .collect().map(_.getLong(0))
    val qids = (0 until 32).map(i => ids(i * ids.length / 32))
    val k = 10
    val cb = Pq.train(emb, "vec_id", "embedding", 4, 8, 2)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb,
      carry = Seq("label")).persist()
    val cb2 = Pq.train(emb, "vec_id", "embedding", 8, 64, 2)
    val codes2 = Pq.encode(emb, "vec_id", "embedding", cb2,
      carry = Seq("label")).persist()
    def topIds(df: org.apache.spark.sql.DataFrame,
               idCol: String): Set[Long] =
      df.select(idCol).collect().map(_.getLong(0)).toSet
    var rIvf, rInt8, rPq, rLsh = 0.0
    var rIvf8, rPq2, rLsh4, rPqRr = 0.0
    var rIvfPqRr, rIvfPqRr8 = 0.0
    var lshFound = 0.0
    qids.foreach { qid =>
      val query = emb.filter(col("vec_id") === qid)
        .select(col("embedding").as("qv"))
      val exact = topIds(
        Similarity.bruteForceKnn(emb, "vec_id", "embedding", query, k),
        "vec_id")
      rIvf += (topIds(Similarity.ivfKnn(emb, "vec_id", "embedding",
        query, k, 16, 4), "vec_id") & exact).size.toDouble / k
      rInt8 += (topIds(Similarity.knnInt8(emb, "vec_id", "embedding",
        query, k), "vec_id") & exact).size.toDouble / k
      val qv = Pq.quantizedQuery(
        emb.filter(col("vec_id") === qid), "embedding")
      rPq += (topIds(Pq.knnAdc(codes, cb, qv, k), "id") & exact)
        .size.toDouble / k
      val lsh = topIds(Similarity.lshKnn(emb, "vec_id", "embedding",
        query, k, nPlanes = 8, dim = 64), "vec_id")
      rLsh += (lsh & exact).size.toDouble / k
      lshFound += lsh.size.toDouble / k
      // the tuned row: the knob each config's recall trades against
      rIvf8 += (topIds(Similarity.ivfKnn(emb, "vec_id", "embedding",
        query, k, 16, 8), "vec_id") & exact).size.toDouble / k
      val qv2 = Pq.quantizedQuery(
        emb.filter(col("vec_id") === qid), "embedding")
      rPq2 += (topIds(Pq.knnAdc(codes2, cb2, qv2, k), "id") & exact)
        .size.toDouble / k
      rLsh4 += (topIds(Similarity.lshKnn(emb, "vec_id", "embedding",
        query, k, nPlanes = 4, dim = 64), "vec_id") & exact)
        .size.toDouble / k
      // PQ's deployment shape: ADC SHORTLIST (10k candidates) + exact
      // re-rank of the shortlist — compression prunes, floats decide
      val shortlist = topIds(Pq.knnAdc(codes2, cb2, qv2, 100), "id")
      val rr = topIds(Similarity.bruteForceKnn(
        emb.filter(col("vec_id").isInCollection(shortlist)),
        "vec_id", "embedding", query, k), "vec_id")
      rPqRr += (rr & exact).size.toDouble / k
      // the r16 deployable twin: IVF routing prunes the scan to 4/16
      // cells, ADC shortlists inside them, exact cosine decides
      rIvfPqRr += (topIds(Pq.ivfPqKnnRerank(emb, "vec_id", "embedding",
        cb2, emb.filter(col("vec_id") === qid), k, 16, 4, 100),
        "vec_id") & exact).size.toDouble / k
      // the dial claim, measured: doubling nProbe should track the
      // plain-IVF 8-probe ceiling (0.856) instead of the 4-probe one
      rIvfPqRr8 += (topIds(Pq.ivfPqKnnRerank(emb, "vec_id", "embedding",
        cb2, emb.filter(col("vec_id") === qid), k, 16, 8, 100),
        "vec_id") & exact).size.toDouble / k
    }
    val n = qids.size
    cell("annrecall", "sf" -> sfDir, "queries" -> n, "k" -> k,
      "ivf_16c_4p" -> rIvf / n, "int8_sq" -> rInt8 / n,
      "pq_m4_k8" -> rPq / n, "lsh_8planes" -> rLsh / n,
      "lsh_bucket_fill" -> lshFound / n)
    cell("annrecall_tuned", "sf" -> sfDir, "queries" -> n, "k" -> k,
      "ivf_16c_8p" -> rIvf8 / n, "pq_m8_k64" -> rPq2 / n,
      "pq_m8_k64_shortlist100_rerank" -> rPqRr / n,
      "ivfpq_m8k64_16c_4p_short100_rerank" -> rIvfPqRr / n,
      "ivfpq_m8k64_16c_8p_short100_rerank" -> rIvfPqRr8 / n,
      "lsh_4planes" -> rLsh4 / n)
  }

  private def snapmerge(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    locally { // warm-up: absorb class loading before the first cell
      val d = s"$work/snapmerge_warm"
      Snapshot.publishSnapshot(spark.range(1000L)
        .select(col("id").as("k"), col("id").as("grp"),
          lit("w").as("payload")), d, statsCol = Some("k"))
      Snapshot.mergeSnapshot(spark.range(10L)
        .select(col("id").as("k"), lit(0L).as("grp"),
          lit("u").as("payload")), d, "k")
      ()
    }
    for (scale <- Seq(1, 10); clustered <- Seq(true, false)) {
      val rows = 2000000L * scale
      val files = 64 * scale
      val dest = s"$work/snapmerge_${scale}_$clustered"
      val df = spark.range(rows)
        .select(col("id").as("k"), (col("id") % 97).as("grp"),
          lpad(lit("x"), 120, "x").as("payload"))
        .repartitionByRange(files, col("k"))
      // clustered: stats ON the merge key (fast path fires);
      // control: stats on another column (full key-column scan)
      Snapshot.publishSnapshot(df, dest,
        statsCol = Some(if (clustered) "k" else "grp"))
      val updates = spark.range(1000L, 11000L)
        .select(col("id").as("k"), lit(-1L).as("grp"),
          lit("updated").as("payload"))
      val (v, wall) = time(Snapshot.mergeSnapshot(updates, dest, "k"))
      val m = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dest/manifest/v$v.txt")), "UTF-8")
      // carried = base files UNTOUCHED (referenced, zero I/O); the
      // data/v2 line count is delta write-parallelism, not touch count
      val carried = m.split("\n").count(_.contains("data/v1/"))
      cell("snapmerge", "base_rows" -> rows, "base_files" -> files,
        "stats_on_key" -> clustered, "merge_sec" -> wall,
        "files_carried" -> carried, "files_touched" -> (files - carried))
    }
    // streaming producer commit cost as the table accumulates versions:
    // appends reference history; under the two-level manifest a commit
    // writes O(versions) reference lines + its own delta — measure
    // early vs late per-batch commit (the version-count growth axis)
    val destS = s"$work/snapstream_growth"
    val batch = spark.range(10000L)
      .select(col("id").as("k"), lit("p").as("payload")).coalesce(1)
    var early = 0.0
    var late = 0.0
    (0 until 200).foreach { i =>
      val (_, w) = time(
        graft.streaming.Ingest.applySnapshotBatch(batch, destS, i.toLong))
      if (i < 10) early += w / 10 else if (i >= 190) late += w / 10
    }
    cell("snapstream_growth", "batches" -> 200,
      "early_commit_sec" -> early, "late_commit_sec" -> late)
  }

  /** The manifest scale frontier: synthesize version state at 1e5 and
    * 1e6 DATA-FILE LINES — the 100 TB file-count class; no data bytes
    * are needed because every measured step is manifest arithmetic —
    * and measure (a) append COMMIT cost, which under the two-level
    * manifest list never resolves the base's delta manifests and so
    * must stay FLAT across the 10×, (b) full line resolution
    * (readManifest + reference expansion), the cost a reader pays once
    * per scan, and (c) filesForRange skipping arithmetic over the
    * resolved lines. The flat-manifest design this replaced re-wrote
    * and re-read the full file list per commit — O(total files) driver
    * strings; the cells here are the evidence the layering removed
    * that bound. */
  private def manifestscale(spark: SparkSession, work: String): Unit = {
    import graft.operators.Snapshot
    import org.apache.hadoop.fs.Path
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    for (nLines <- Seq(100000, 1000000)) {
      val dest = s"$work/mscale_$nLines"
      val fs = new Path(dest).getFileSystem(
        spark.sessionState.newHadoopConf())
      fs.mkdirs(new Path(s"$dest/manifest"))
      def put(rel: String, content: String): Unit = {
        val out = fs.create(new Path(s"$dest/$rel"), true)
        out.write(content.getBytes("UTF-8")); out.close()
      }
      // synthetic base: nLines stats lines across 100 delta manifests —
      // the shape a long-lived streaming table converges to after
      // compaction cycles; claim files burn ids 1..100 so real appends
      // stage past the synthetic range
      val nDeltas = 100
      val perDelta = nLines / nDeltas
      val entries = (1 to nDeltas).map { d =>
        val lines = (0 until perDelta).map { i =>
          val base = (d - 1).toLong * perDelta + i
          s"data/v$d/part-$i\t1000\t${base * 1000}\t${base * 1000 + 999}"
        }
        put(s"manifest/d$d.txt", lines.mkString("\n"))
        put(s"manifest/.claim_v$d", "")
        s"@manifest/d$d.txt"
      }
      put("manifest/v1.txt",
        (s"#schema=${st.json}" +: "#stats=k" +: entries).mkString("\n"))
      val batch = spark.range(100L)
        .select(col("id").as("k"), lit("x").as("v")).coalesce(1)
      // warm-up append absorbs parquet-writer init; then 3 timed
      Snapshot.appendSnapshot(batch, dest)
      val walls = (1 to 3).map { _ =>
        time(Snapshot.appendSnapshot(batch, dest))._2
      }
      val latest = Snapshot.latestVersion(spark, dest)
      val (resolved, wRead) = time(Snapshot.manifestLines(spark, dest, latest))
      val (hits, wRange) = time(Snapshot.filesForRange(spark, dest, latest,
        5000000L, 5100000L))
      cell("manifest_scale", "lines" -> nLines,
        "append_commit_sec" -> walls.sum / 3,
        "resolve_sec" -> wRead, "resolved_lines" -> resolved.size,
        "range_sec" -> wRange, "range_hits" -> hits.size)
    }
  }

  /** Fixed 10k-key open set + 2k-row delta; axis is closed-history size. */
  private def scd2(spark: SparkSession, work: String): Unit = {
    import graft.streaming.Ingest
    // warm-up run (same machinery, tiny state) so cell 1 isn't inflated
    locally {
      spark.range(100L).select(col("id").as("key"), lit(0L).as("v"),
        lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
        .write.parquet(s"$work/scd2_warm_dest/open")
      spark.range(10L).select(col("id").as("key"), lit(1L).as("v"))
        .write.parquet(s"$work/scd2_warm_src")
      Ingest.scd2Stream(spark, s"$work/scd2_warm_src", "*.parquet",
        s"$work/scd2_warm_dest", s"$work/scd2_warm_ckpt", Seq("key"),
        identity)
      ()
    }
    for (closedRows <- Seq(100000L, 10000000L)) {
      val tag = s"$closedRows"
      val src = s"$work/scd2_src_$tag"
      val dest = s"$work/scd2_dest_$tag"
      val ckpt = s"$work/scd2_ckpt_$tag"
      // seed the dest layout directly: open/ = current row per key,
      // closed/ = immutable history delta dirs
      spark.range(10000L)
        .select(col("id").as("key"), (col("id") % 7).as("v"),
          lit(0L).as("valid_from"), lit(null).cast("long").as("valid_to"))
        .write.parquet(s"$dest/open")
      // delta_seed, NOT delta_0: the stream's first micro-batch has
      // batchId 0 and its replay guard skips a delta dir that already
      // exists under its own id — a delta_0 seed would silently absorb
      // the measured batch's closed output
      spark.range(closedRows)
        .select((col("id") % 10000L).as("key"), (col("id") % 13).as("v"),
          col("id").as("valid_from"), (col("id") + 1).as("valid_to"))
        .write.parquet(s"$dest/closed/delta_seed")
      spark.range(2000L)
        .select(col("id").as("key"), (col("id") % 11 + 100).as("v"))
        .write.parquet(src)
      // time the stream (foreachBatch apply + commit) only — the
      // returned full-history read-back is deliberately NOT counted,
      // it would scan the closed rows this rehearsal proves the APPLY
      // never touches
      val (_, wall) = time { Ingest.scd2Stream(spark, src, "*.parquet",
        dest, ckpt, Seq("key"), identity); () }
      cell("scd2_batch", "closed_rows" -> closedRows, "batch_sec" -> wall)
    }
  }
}
