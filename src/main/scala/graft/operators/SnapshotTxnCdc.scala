package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRANSACTION-CONSISTENT CDC — the incremental face of the
  * multi-table story ([[SnapshotTxn]]): where [[SnapshotCdc]] follows
  * ONE table version-by-version, this follows the transaction LOG
  * txn-by-txn and hands the consumer every enrolled table's change
  * events for the window IN ONE DELTA — so a downstream
  * materialization (a joined view over samples + datasets, a search
  * index spanning both) can never apply half a transaction, no matter
  * how its micro-batches align with commits. The reference's
  * registration unit of work stays atomic all the way into derived
  * state, not just in the primary tables.
  *
  * Event model per table (the [[Snapshot.changeFeed]] row shape —
  * table columns + `_change_type` + `_commit_version`):
  *   - first sight of a table (enrolled before or at the window's
  *     start that the consumer never saw): the FULL resolved state at
  *     the window-end version, as `insert` events — the bootstrap;
  *   - after that: `changeFeed` between the table's asOfTxn versions —
  *     inserts, whole-row upsert postimages, pure-delete keys.
  * A window crossing a rewrite (compact/reconcile/CoW-merge removed
  * manifest lines) refuses with changeFeed's re-bootstrap message —
  * the same contract as every incremental reader here.
  *
  * Resume/replay semantics are [[SnapshotCdc.pump]]'s, lifted to txn
  * ids: the applied-TXN watermark lives in the consumer's checkpoint
  * and advances (rename-committed) only AFTER the processor returns,
  * so a crash replays the window verbatim; processors are idempotent
  * per window.
  *
  * Cost per pump: O(new txns) manifest reads + O(changed files) data —
  * never O(tables), never O(total txns ever committed). The checkpoint
  * persists the (table → version) snapshot AT the watermark beside the
  * watermark itself (one atomic file), so each window folds only ITS
  * OWN txn manifests onto the cached prefix (`asOfTxn`'s
  * `sinceTxn`/`prefix` fast path) instead of refolding the log from
  * txn 1. That also makes consumption PRUNE-TOLERANT: once the
  * snapshot is cached, [[SnapshotTxn.vacuumTxnLog]] may drop the whole
  * prefix at or below the watermark and pumps keep working; even a
  * COLD consumer on a pruned log bootstraps, via the fold snapshot the
  * vacuum left behind.
  */
object SnapshotTxnCdc {
  /** One consistent window: every enrolled table's change events for
    * transactions (fromTxn, toTxn]. Tables whose version did not move
    * in the window are absent from `tables`; `versions` is the FULL
    * (table → version) snapshot at `toTxn` — what a txn-pinned applier
    * reads base state from ([[MaterializedView.refreshTxnJoinView]])
    * and what the pump persists as the next window's fold prefix.
    * `bootstrapped` names the tables whose events are FULL-STATE
    * inserts rather than a true delta (first sight of a late-enrolled
    * table, or a rewrite-rebootstrap) — an applier that tracks
    * presence (not just values) must reconcile against the full state
    * for those, since a bootstrap cannot carry delete events. */
  final case class TxnDelta(fromTxn: Int, toTxn: Int,
                            tables: Map[String, DataFrame],
                            versions: Map[String, Int],
                            bootstrapped: Set[String] = Set.empty)

  /** The change events of transactions (appliedTxn, upTo] — None when
    * nothing new. `appliedTxn` = 0 bootstraps every enrolled table.
    * Runs recovery first (a committed-but-unfinalized txn must land
    * before its versions are readable). `prefix`, when given, is the
    * caller's cached `asOfTxn(appliedTxn)` snapshot: the fold then
    * touches only the window's own manifests (O(window txns)), and a
    * log whose prefix ≤ appliedTxn was pruned stays readable.
    *
    * `rebootstrapOnRewrite`: a window crossing a REWRITE of an
    * enrolled table (compact / reconcile / MoR log fold / CoW merge
    * removed manifest lines) normally refuses with changeFeed's
    * re-bootstrap error — correct, but it permanently wedges a live
    * consumer the moment routine maintenance touches a hot table.
    * With the flag, that table's window degrades to the documented
    * recovery AUTOMATICALLY: its full resolved state at the window
    * end, delivered as `insert` events and named in
    * `TxnDelta.bootstrapped` (one O(table) read per rewrite event —
    * the price maintenance always cost consumers; appliers must be
    * full-state-idempotent, which key-value and recompute-by-group
    * appliers are). */
  def changesSince(spark: SparkSession, txnRoot: String, appliedTxn: Int,
                   upTo: Option[Int] = None,
                   prefix: Option[Map[String, Int]] = None,
                   rebootstrapOnRewrite: Boolean = false): Option[TxnDelta] = {
    SnapshotTxn.recover(spark, txnRoot)
    val head = SnapshotTxn.latestTxn(spark, txnRoot)
    val to = upTo.getOrElse(head)
    require(to <= head,
      s"requested txn CDC up to txn $to but $txnRoot is at txn $head")
    require(appliedTxn >= 0 && appliedTxn <= to,
      s"applied txn $appliedTxn outside [0, $to] for $txnRoot")
    if (to == appliedTxn) return None
    val fromVs: Map[String, Int] =
      if (appliedTxn == 0) Map.empty
      else prefix.getOrElse(
        SnapshotTxn.asOfTxn(spark, txnRoot, appliedTxn))
    // ONE incremental fold for the window end: the start snapshot is
    // the prefix (cached or just computed), so only manifests
    // (appliedTxn, to] are read — per-pump cost O(new txns), as doc'd
    val toVs =
      if (appliedTxn == 0) SnapshotTxn.asOfTxn(spark, txnRoot, to)
      else SnapshotTxn.asOfTxn(spark, txnRoot, to,
        sinceTxn = appliedTxn, prefix = fromVs)
    def fullState(t: String, vTo: Int): DataFrame =
      Snapshot.readSnapshot(spark, t, vTo)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(vTo))
    val boot = scala.collection.mutable.Set.empty[String]
    val tables = toVs.flatMap { case (t, vTo) =>
      fromVs.get(t) match {
        case Some(vFrom) if vFrom == vTo => None // untouched this window
        case Some(vFrom) =>
          // changeFeed's rewrite refusal is raised EAGERLY (its manifest
          // diff runs in the driver), so the fallback decision is
          // deterministic, never a mid-job surprise
          val feed =
            try Snapshot.changeFeed(spark, t, vFrom, vTo)
            catch {
              case e: IllegalArgumentException
                if rebootstrapOnRewrite && e.getMessage != null &&
                  e.getMessage.contains("re-bootstrap") =>
                boot += t
                fullState(t, vTo)
            }
          Some(t -> feed)
        case None =>
          // bootstrap: the full resolved state at the window end, as
          // insert events in the changeFeed row shape
          boot += t
          Some(t -> fullState(t, vTo))
      }
    }
    Some(TxnDelta(appliedTxn, to, tables, toVs, boot.toSet))
  }

  /** The consumer's applied-txn watermark (0 before the first
    * successful window). */
  def appliedTxn(spark: SparkSession, checkpointDir: String): Int =
    appliedState(spark, checkpointDir)._1

  /** The checkpoint's (watermark, cached asOfTxn snapshot at it).
    * Snapshot None on a pre-snapshot (single-line) checkpoint — the
    * next pump refolds once (from the log's vacuum fold snapshot when
    * one exists) and upgrades the file. */
  private def appliedState(spark: SparkSession,
                           checkpointDir: String): (Int, Option[Map[String, Int]]) = {
    val fs = new Path(checkpointDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val p = new Path(s"$checkpointDir/applied-txn")
    if (!fs.exists(p)) (0, Some(Map.empty))
    else {
      val lines = Snapshot.readTextLines(fs, p.toString)
      val k = lines.head.trim.toInt
      val vs = lines.tail.map { l =>
        val f = l.split("\t")
        require(f.length == 2,
          s"malformed applied-txn snapshot line in $checkpointDir: $l")
        f(0) -> f(1).toInt
      }.toMap
      // a legacy one-line file records no snapshot; an upgraded file
      // with zero tables is only valid at watermark 0
      if (k > 0 && lines.tail.isEmpty) (k, None) else (k, Some(vs))
    }
  }

  private def advance(spark: SparkSession, checkpointDir: String,
                      to: Int, versions: Map[String, Int]): Unit = {
    val fs = new Path(checkpointDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(checkpointDir))
    // watermark + snapshot travel in ONE atomic file: a crash can never
    // leave a watermark whose fold prefix is missing or stale
    Snapshot.writeFileAtomic(fs, s"$checkpointDir/applied-txn",
      s"$checkpointDir/.applied-txn.tmp",
      to.toString +:
        versions.toSeq.sortBy(_._1).map { case (t, v) => s"$t\t$v" })
  }

  /** Consume every transaction committed after the checkpoint's
    * watermark in ≤`maxTxnsPerBatch`-txn windows: invoke `process`,
    * then advance the watermark (rename-committed). One consumer per
    * checkpoint directory; `process` must be idempotent per window — a
    * crash between process and advance replays the window verbatim on
    * the next pump. Returns the number of windows processed. */
  def pump(spark: SparkSession, txnRoot: String, checkpointDir: String,
           maxTxnsPerBatch: Int = Int.MaxValue,
           rebootstrapOnRewrite: Boolean = false)
          (process: TxnDelta => Unit): Int = {
    require(maxTxnsPerBatch >= 1,
      s"maxTxnsPerBatch must be >= 1, got $maxTxnsPerBatch")
    SnapshotTxn.recover(spark, txnRoot)
    val head = SnapshotTxn.latestTxn(spark, txnRoot)
    var (applied, cached) = appliedState(spark, checkpointDir)
    var n = 0
    while (applied < head) {
      val to = math.min(applied.toLong + maxTxnsPerBatch, head.toLong).toInt
      val d = changesSince(spark, txnRoot, applied, Some(to),
        prefix = if (applied == 0) None else cached,
        rebootstrapOnRewrite = rebootstrapOnRewrite)
      d.foreach(process)
      val vs = d.map(_.versions).getOrElse(cached.getOrElse(Map.empty))
      advance(spark, checkpointDir, to, vs)
      applied = to
      cached = Some(vs)
      n += 1
    }
    n
  }
}
