package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over the snapshot layout
  * (the Delta Live Tables / Materialize story, manifest-native): a
  * grouped count+sum view of an APPEND-ONLY source table, refreshed
  * from the source's manifest CDC ([[Snapshot.changedBetween]]) at
  * O(delta + touched-view) cost — never O(source table). The view is
  * itself a snapshot table, so it time-travels, vacuums, and serves
  * reads with whatever skipping its stats column provides.
  *
  * Exactly-once refresh rides the commit tag: every view version is
  * committed with `src_v<k>` = the source version it incorporates.
  * A refresh first resolves the view's applied version from the LATEST
  * tag — a replayed or crashed-and-retried refresh sees its own tag
  * and returns without writing (the same idempotence mechanism the
  * streaming snapshot producer uses, `Snapshot.versionTag`).
  *
  * Cost anatomy at 100 TB:
  *  - delta read: only the files ADDED between applied and latest
  *    source versions (manifest set difference — no data diffed);
  *  - delta aggregation: map-side combinable partial agg, shuffle
  *    carries one row per TOUCHED KEY;
  *  - old-value lookup: the view is scanned COLUMN-PRUNED and
  *    semi-joined to the touched keys (with view stats on the group
  *    key, mergeSnapshot's range narrowing applies on the write side);
  *  - view commit: [[Snapshot.mergeSnapshot]] — rewrites only view
  *    files holding a touched key, carries the rest by reference.
  *
  * Retention contract: refresh needs the source manifest at the
  * APPLIED version to still exist (the CDC base); vacuum the source
  * only past the view's applied version.
  */
object MaterializedView {
  /** The source version a view version incorporates, from its tag. */
  private def appliedSrcVersion(spark: SparkSession, mvDir: String,
                                mvV: Int): Int = {
    val tag = Snapshot.versionTag(spark, mvDir, mvV).getOrElse(
      throw new IllegalStateException(
        s"view version v$mvV of $mvDir carries no src_v tag — not a " +
          "MaterializedView-maintained table"))
    require(tag.startsWith("src_v"), s"foreign tag '$tag' on $mvDir v$mvV")
    tag.stripPrefix("src_v").toInt
  }

  /** Create or incrementally refresh the count+sum view
    * `keyCol → (cnt, total)` of `srcDir` into `mvDir`. Returns the view
    * version that incorporates the source's current latest (which may
    * be an already-committed one — replay is a no-op). First call
    * bootstraps with a full aggregate publish; later calls fold ONLY
    * the delta files in. `valCol` must be integral (the engine's
    * fixed-point money discipline — no float accumulation drift). */
  def refreshSumView(spark: SparkSession, srcDir: String, mvDir: String,
                     keyCol: String, valCol: String,
                     viewFiles: Int = 0): Int = {
    val srcLatest = Snapshot.latestVersion(spark, srcDir)
    require(srcLatest >= 1, s"no committed source version under $srcDir")
    val mvLatest = Snapshot.latestVersion(spark, mvDir)
    if (mvLatest == 0) {
      // bootstrap: one full aggregate of the current source version.
      // With viewFiles > 0 the view lands RANGE-CLUSTERED on the group
      // key with manifest stats — that is what makes every later
      // refresh's merge O(touched): stats-range narrowing on the
      // discovery scan, untouched view files carried by reference. A
      // one-file view (AQE's natural shape for a small aggregate) would
      // make each refresh a full view rewrite.
      val full = Snapshot.readSnapshot(spark, srcDir, srcLatest)
        .groupBy(col(keyCol))
        .agg(count(lit(1)).as("cnt"),
          sum(col(valCol).cast("long")).as("total"))
      val (shaped, stats) =
        if (viewFiles > 0)
          (full.repartitionByRange(viewFiles, col(keyCol)), Some(keyCol))
        else (full, None)
      return Snapshot.publishSnapshot(shaped, mvDir, statsCol = stats,
        tag = Some(s"src_v$srcLatest"))
    }
    val applied = appliedSrcVersion(spark, mvDir, mvLatest)
    if (applied >= srcLatest) return mvLatest // replay / nothing new
    // the shared CDC reader verifies the APPEND-ONLY contract (a
    // compaction/merge/re-Z-order between refreshes re-states old rows
    // in new files, which set-difference would double-count — refused
    // loudly) and hands back exactly the added rows
    val delta = SnapshotCdc
      .changesSince(spark, srcDir, applied, Some(srcLatest))
      .getOrElse(return mvLatest).rows
    val deltaAgg = delta.groupBy(col(keyCol))
      .agg(count(lit(1)).as("d_cnt"),
        sum(col(valCol).cast("long")).as("d_total"))
    // old values for touched keys only. With the view range-clustered
    // on the group key (the viewFiles bootstrap shape), the lookup
    // opens ONLY view files whose [min, max] overlaps the delta's key
    // range — manifest arithmetic, so a narrow delta against a huge
    // view reads a handful of files; the stats-less fallback scans the
    // view column-pruned (correct, just wider).
    val isIntegralKey = deltaAgg.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // the narrow path is taken ONLY when the view's stats column IS the
    // group key — a range read pruning on any other column would
    // silently miss old values (corrupt totals, the one failure mode
    // an incremental view must never have)
    val statsIsKey =
      Snapshot.statsColsOf(spark, mvDir, mvLatest).headOption
        .contains(keyCol)
    val current = (if (isIntegralKey && statsIsKey) {
      val mm = deltaAgg.agg(min(col(keyCol)).cast("long"),
        max(col(keyCol)).cast("long")).head()
      if (mm.isNullAt(0))
        Snapshot.readSnapshot(spark, mvDir, mvLatest).limit(0)
      else Snapshot.readSnapshotRange(spark, mvDir, mvLatest,
        mm.getLong(0), mm.getLong(1))
    } else Snapshot.readSnapshot(spark, mvDir, mvLatest))
      .select(col(keyCol), col("cnt"), col("total"))
    val updates = deltaAgg.join(current, Seq(keyCol), "left")
      .select(col(keyCol),
        (col("d_cnt") + coalesce(col("cnt"), lit(0L))).as("cnt"),
        (col("d_total") + coalesce(col("total"), lit(0L))).as("total"))
    // the tag rides the SAME merge commit (atomic with the data), so a
    // crash between "merged" and "recorded applied version" cannot exist
    Snapshot.mergeSnapshot(updates, mvDir, keyCol,
      tag = Some(s"src_v$srcLatest"))
  }

  // ------------------------------------------- txn-consistent join view
  /** TXN-CONSISTENT MATERIALIZED VIEW over TWO tables — the reference's
    * experimental-design report (sample rows joined to their datasets,
    * `get-experimental-design-tsv`) maintained incrementally WITHOUT
    * ever holding half a transaction: the refresh consumes the
    * transaction log through [[SnapshotTxnCdc.pump]], so each window is
    * a consistent multi-table delta — a registration that upserts a
    * sample AND appends its datasets in one txn reaches the view as one
    * change, never as a sample-only or datasets-only intermediate
    * (which two independent single-table CDC feeds cannot guarantee).
    *
    * View shape: one row per sample —
    * `sampleKey, sampleCols…, n_ds, total` (dataset count and the sum
    * of `dsValCol`, 0-filled for sample rows with no datasets — the
    * report's left-join shape). Maintenance per window:
    *   - touched keys = sample-event keys ∪ the `dsSampleCol` of
    *     dataset insert events (bounded by the window's change volume);
    *   - their groups recompute against the WINDOW-END txn-pinned
    *     versions (`TxnDelta.versions`) — samples column-pruned +
    *     semi-joined; datasets range-pruned when its manifest stats
    *     column IS `dsSampleCol` (the refreshSumView narrow path),
    *     column-pruned + semi-joined otherwise;
    *   - one [[Snapshot.applySnapshotMoR]] commit lands the upserts AND
    *     the disappearing keys atomically, tagged `txn<toTxn>` — a
    *     replayed window sees its tag on the view head and skips, so
    *     crash-anywhere replay converges (the pump advances its
    *     watermark only after the window returns).
    * Datasets must reach the view APPEND-ONLY on true delta windows (a
    * dataset delete/upsert event carries no pre-image, so the OLD
    * group is unknowable from the feed — refused loudly; re-key or
    * rebuild for mutable dataset tables). A REWRITE window
    * (rebootstrap) is the exception that stays correct: every existing
    * view group recomputes from the full dataset state, which is
    * mutation-agnostic — even deletes folded into the rewrite resolve.
    * Samples may insert/upsert/delete freely: their events carry the
    * group key itself.
    *
    * Returns the number of windows processed. */
  def refreshTxnJoinView(spark: SparkSession, txnRoot: String,
                         samplesDir: String, datasetsDir: String,
                         mvDir: String, checkpointDir: String,
                         sampleKey: String, sampleCols: Seq[String],
                         dsSampleCol: String, dsValCol: String,
                         maxTxnsPerBatch: Int = Int.MaxValue): Int =
    refreshTxnView(spark, txnRoot, samplesDir, datasetsDir, mvDir,
      checkpointDir, countSumSpec(sampleKey, sampleCols, dsSampleCol,
        dsValCol), maxTxnsPerBatch)

  /** The fixed count+sum shape as a [[TxnViewSpec]] — what
    * [[refreshTxnJoinView]] has always maintained. */
  private def countSumSpec(sampleKey: String, sampleCols: Seq[String],
                           dsSampleCol: String,
                           dsValCol: String): TxnViewSpec =
    TxnViewSpec(sampleKey, sampleCols, dsSampleCol,
      Seq(TxnViewAgg("n_ds", count(lit(1)), lit(0L)),
        TxnViewAgg("total", sum(col(dsValCol).cast("long")), lit(0L))))

  /** One dataset-side aggregate of a [[TxnViewSpec]]: `agg` evaluated
    * over each sample's dataset rows, `default` filling samples with
    * no datasets (the left-join zero — must be `agg`'s type). */
  final case class TxnViewAgg(name: String,
                              agg: org.apache.spark.sql.Column,
                              default: org.apache.spark.sql.Column)

  /** A broadcast DIMENSION DECODE on a sample column — the reference
    * report's vocabulary join (`get-experimental-design-tsv/script.py:
    * 42-51`: property codes decode to vocabulary labels before the
    * row lands in the TSV): `table` is left-joined on `joinCol` (which
    * must be the sample key or a projected sample column), `cols`
    * project into the view. The dimension is pinned per refresh call;
    * a changed vocabulary needs a view rebuild (vocabularies are
    * static reference data — the same assumption the report makes). */
  final case class TxnViewDim(table: DataFrame, joinCol: String,
                              cols: Seq[String])

  /** Declarative shape of a generalized txn-consistent view: projected
    * sample columns, a caller-supplied dataset aggregate list, and a
    * CHAIN of broadcast dimension decodes — the parameterization that
    * lets the reference's ACTUAL experimental-design report (property
    * projection + vocabulary decode + rollup, `get-experimental-design
    * -tsv/script.py:60-94`) run as a maintained view instead of only
    * count+sum. `dims` chain N-ARY (r16): dim i may join on a column
    * PRODUCED by an earlier dim — the reference's three-level shape
    * (sample → parent sample → vocabulary, `script.py:16-54`) is a
    * parent dimension producing the parent's code followed by the
    * vocabulary dimension decoding it. Each dim broadcasts (dimensions
    * are label-sized by definition) and is pinned per refresh call. */
  final case class TxnViewSpec(sampleKey: String, sampleCols: Seq[String],
                               dsSampleCol: String,
                               dsAggs: Seq[TxnViewAgg],
                               dims: Seq[TxnViewDim] = Nil) {
    require(dsAggs.nonEmpty, "a TxnViewSpec needs at least one aggregate")
    dims.zipWithIndex.foldLeft(Set(sampleKey) ++ sampleCols) {
      case (avail, (d, i)) =>
        require(avail(d.joinCol),
          s"TxnViewDim($i).joinCol '${d.joinCol}' must be the sample " +
            "key, a projected sample column, or a column produced by an " +
            "EARLIER dim (dims chain in order)")
        avail ++ d.cols
    }
  }

  /** [[refreshTxnJoinView]] generalized over a [[TxnViewSpec]]: same
    * txn-consistent incremental maintenance (touched keys from the
    * window's events, txn-pinned recompute, ONE MoR commit for upserts
    * + vanished keys, tag-guarded replay, rewrite windows degrading to
    * O(view)), arbitrary projected columns / aggregates / decode.
    * Returns the number of windows processed. */
  def refreshTxnView(spark: SparkSession, txnRoot: String,
                     samplesDir: String, datasetsDir: String,
                     mvDir: String, checkpointDir: String,
                     spec: TxnViewSpec,
                     maxTxnsPerBatch: Int = Int.MaxValue): Int =
    // rebootstrapOnRewrite: routine maintenance on the base tables
    // (compaction, MoR log fold, reconcile) must not wedge the view —
    // a rewritten table's window degrades to full-state inserts, and
    // the applier below reconciles stale view keys against it
    SnapshotTxnCdc.pump(spark, txnRoot, checkpointDir, maxTxnsPerBatch,
        rebootstrapOnRewrite = true) {
      d => applyTxnViewWindow(spark, d, samplesDir, datasetsDir, mvDir,
        spec)
    }

  /** Qualified-path form for table identity — spellings that name the
    * same directory must match ([[SnapshotTxn.readAsOfTxn]]'s rule). */
  private def qualify(spark: SparkSession, p: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
      .makeQualified(new org.apache.hadoop.fs.Path(p)).toString
  }

  /** The view's output shape — one row per sample with its decoded
    * dimension columns and dataset aggregates (left join, defaults
    * filling no-dataset samples). ONE definition shared by the
    * bootstrap and every incremental window: the two paths must never
    * drift apart in schema or semantics. */
  private def viewRollup(samples: DataFrame, datasets: DataFrame,
                         spec: TxnViewSpec): DataFrame = {
    val named = spec.dsAggs.map(a => a.agg.as(a.name))
    val dGrp = datasets.groupBy(col(spec.dsSampleCol).as(spec.sampleKey))
      .agg(named.head, named.tail: _*)
    val s0 = samples.select(
      (spec.sampleKey +: spec.sampleCols).map(col): _*)
    // the dimension decodes BROADCAST: a dimension is label-sized by
    // definition, and a shuffle join here would re-shuffle the whole
    // sample side every window. Chained in declaration order, so a
    // later dim can join on a column an earlier one produced (the
    // three-level sample → parent → vocabulary shape)
    val s1 = spec.dims.foldLeft(s0) { (acc, dm) =>
      acc.join(broadcast(dm.table.select(
        (dm.joinCol +: dm.cols).map(col): _*)), Seq(dm.joinCol), "left")
    }
    val dimCols = spec.dims.flatMap(_.cols)
    s1.join(dGrp, Seq(spec.sampleKey), "left")
      .select(col(spec.sampleKey) +:
        ((spec.sampleCols ++ dimCols).map(col) ++
          spec.dsAggs.map(a =>
            coalesce(col(a.name), a.default).as(a.name))): _*)
  }

  /** One [[refreshTxnJoinView]] window — the count+sum wrapper kept
    * for the q_txn_mv gate and existing callers. */
  private[graft] def applyTxnJoinWindow(spark: SparkSession,
      d: SnapshotTxnCdc.TxnDelta, samplesDir: String, datasetsDir: String,
      mvDir: String, sampleKey: String, sampleCols: Seq[String],
      dsSampleCol: String, dsValCol: String): Unit =
    applyTxnViewWindow(spark, d, samplesDir, datasetsDir, mvDir,
      countSumSpec(sampleKey, sampleCols, dsSampleCol, dsValCol))

  /** One [[refreshTxnView]] window — factored out so gates/specs
    * can inject a crash between windows and replay. Idempotent per
    * window (the `txn<k>` tag guard). */
  private[graft] def applyTxnViewWindow(spark: SparkSession,
      d: SnapshotTxnCdc.TxnDelta, samplesDir: String, datasetsDir: String,
      mvDir: String, spec: TxnViewSpec): Unit = {
    val sampleKey = spec.sampleKey
    val dsSampleCol = spec.dsSampleCol
    def q(p: String): String = qualify(spark, p)
    def versionOf(dir: String): Option[Int] = {
      val want = q(dir)
      val hits = d.versions.collect { case (t, v) if q(t) == want => v }
      if (hits.isEmpty) None else Some(hits.max)
    }
    def eventsOf(dir: String): Option[DataFrame] = {
      val want = q(dir)
      d.tables.collectFirst { case (t, ev) if q(t) == want => ev }
    }
    val tag = s"txn${d.toTxn}"
    val mvLatest = Snapshot.latestVersion(spark, mvDir)
    if (mvLatest >= 1 &&
        Snapshot.versionTag(spark, mvDir, mvLatest).contains(tag))
      return // replayed window (crash between view commit and watermark)
    val (sV, dV) = (versionOf(samplesDir), versionOf(datasetsDir))
    if (sV.isEmpty || dV.isEmpty) return // a side not enrolled yet
    if (mvLatest == 0) {
      // bootstrap: the full join-aggregate of the txn-pinned state
      Snapshot.publishSnapshot(viewRollup(
        Snapshot.readSnapshot(spark, samplesDir, sV.get),
        Snapshot.readSnapshot(spark, datasetsDir, dV.get), spec), mvDir,
        tag = Some(tag))
      return
    }
    // incremental: touched groups from this window's events only
    val sTouched = eventsOf(samplesDir)
      .map(_.select(col(sampleKey)).distinct())
    val dTouched = eventsOf(datasetsDir).map(_.select(
      // the append-only datasets contract rides the same scan that
      // extracts the touched keys: a non-insert event refuses loudly
      when(col("_change_type") =!= "insert",
        raise_error(lit(s"refreshTxnJoinView: dataset table $datasetsDir " +
          "must reach the view append-only (a delete/upsert event " +
          "carries no pre-image, so its old group is unknowable); " +
          "rebuild the view or re-key the datasets")))
        .otherwise(col(dsSampleCol)).as(sampleKey)).distinct())
    // a REBOOTSTRAPPED datasets window may hide dataset deletes/upserts
    // inside its full-state inserts (a bootstrap cannot carry change
    // types), so the append-only refusal cannot protect it — instead
    // EVERY existing view group joins the touched set and recomputes
    // from the full dataset state, which is mutation-agnostic: vanished
    // datasets zero out, moved ones re-aggregate. O(view) once per
    // rewrite event, the price maintenance always cost consumers.
    val dsBoot = d.bootstrapped.exists(t => q(t) == q(datasetsDir))
    val viewKeysOpt =
      if (!dsBoot) None
      else Some(Snapshot.readSnapshot(spark, mvDir, mvLatest)
        .select(col(sampleKey)))
    val touched = (sTouched.toSeq ++ dTouched.toSeq ++ viewKeysOpt.toSeq)
      .reduceOption(_.unionByName(_)).map(_.distinct())
      .getOrElse(return) // neither table moved in this window
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try applyTouched(spark, d, touched, samplesDir, datasetsDir, mvDir,
      spec, sV.get, dV.get, tag, mvLatest)
    finally { touched.unpersist(); () }
  }

  /** The window's write half: recompute the touched groups against the
    * txn-pinned state and land upserts + vanished keys in one tagged
    * MoR commit. `touched` arrives persisted — it feeds four jobs
    * (range bounds, both pruned semi-joins, the vanish anti-join). */
  private def applyTouched(spark: SparkSession, d: SnapshotTxnCdc.TxnDelta,
      touched: DataFrame, samplesDir: String, datasetsDir: String,
      mvDir: String, spec: TxnViewSpec, sV: Int, dV: Int,
      tag: String, mvLatest: Int): Unit = {
    val sampleKey = spec.sampleKey
    val dsSampleCol = spec.dsSampleCol
    def q(p: String): String = qualify(spark, p)
    val samplesAt = Snapshot.readSnapshot(spark, samplesDir, sV)
    val datasetsAt = Snapshot.readSnapshot(spark, datasetsDir, dV)
    // recompute the touched groups against the txn-pinned state; prune
    // BOTH scans by manifest stats when a side clusters on the key —
    // the dataset side via the literal range read, the samples side via
    // the MoR-transparent predicate read (samples usually carry live
    // tombstones, which readSnapshotRange refuses)
    val isIntegralKey = touched.schema(sampleKey).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    lazy val touchedMm = touched.agg(min(col(sampleKey)).cast("long"),
      max(col(sampleKey)).cast("long")).head()
    def statsIsKey(dir: String, v: Int, c: String): Boolean =
      Snapshot.statsColsOf(spark, dir, v).headOption.contains(c)
    val sScan =
      if (statsIsKey(samplesDir, sV, sampleKey) && isIntegralKey &&
          !touchedMm.isNullAt(0))
        Snapshot.readSnapshotWhere(spark, samplesDir, sV,
          col(sampleKey) >= touchedMm.getLong(0) &&
            col(sampleKey) <= touchedMm.getLong(1))
      else samplesAt
    val sNow = sScan.join(touched, Seq(sampleKey), "left_semi")
    val dScan =
      if (statsIsKey(datasetsDir, dV, dsSampleCol) && isIntegralKey) {
        if (touchedMm.isNullAt(0)) datasetsAt.limit(0)
        else Snapshot.readSnapshotRange(spark, datasetsDir, dV,
          touchedMm.getLong(0), touchedMm.getLong(1))
      } else datasetsAt
    val dNow = dScan.join(touched,
      dScan(dsSampleCol) === touched(sampleKey), "left_semi")
    val updates = viewRollup(sNow, dNow, spec)
    // touched keys with NO sample row at the window end vanish from the
    // view (sample deletes, and dataset rows referencing unknown sids).
    // A REBOOTSTRAPPED samples window carries no delete events (a full
    // state can't), so the vanished set must come from the view itself:
    // every view key absent from the new full state goes — one
    // column-pruned view scan, paid only on the rare rewrite window.
    val sampleBoot = d.bootstrapped.exists(t => q(t) == q(samplesDir))
    val staleViewKeys =
      if (!sampleBoot) None
      else Some(Snapshot.readSnapshot(spark, mvDir, mvLatest)
        .select(col(sampleKey))
        .join(samplesAt.select(col(sampleKey)), Seq(sampleKey),
          "left_anti"))
    // the anti-join probes the PRUNED samples scan: every touched key
    // lies inside [min(touched), max(touched)] by construction, so the
    // range-pruned subset covers every touched key samples could hold
    val gone = (touched.join(sScan.select(col(sampleKey)),
        Seq(sampleKey), "left_anti") +: staleViewKeys.toSeq)
      .reduce(_.unionByName(_)).distinct()
    // ONE MoR commit: upserts + deletes land (and replay) together
    Snapshot.applySnapshotMoR(updates, gone, mvDir, sampleKey,
      tag = Some(tag))
    ()
  }
}
