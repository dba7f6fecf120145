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
  * per window. Cost per pump: O(new txns) manifest reads (the
  * recovered-through watermark keeps recovery flat) + O(changed files)
  * data — never O(tables).
  */
object SnapshotTxnCdc {
  /** One consistent window: every enrolled table's change events for
    * transactions (fromTxn, toTxn]. Tables whose version did not move
    * in the window are absent. */
  final case class TxnDelta(fromTxn: Int, toTxn: Int,
                            tables: Map[String, DataFrame])

  /** The change events of transactions (appliedTxn, upTo] — None when
    * nothing new. `appliedTxn` = 0 bootstraps every enrolled table.
    * Runs recovery first (a committed-but-unfinalized txn must land
    * before its versions are readable). */
  def changesSince(spark: SparkSession, txnRoot: String, appliedTxn: Int,
                   upTo: Option[Int] = None): Option[TxnDelta] = {
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
      else SnapshotTxn.asOfTxn(spark, txnRoot, appliedTxn)
    val toVs = SnapshotTxn.asOfTxn(spark, txnRoot, to)
    val tables = toVs.flatMap { case (t, vTo) =>
      fromVs.get(t) match {
        case Some(vFrom) if vFrom == vTo => None // untouched this window
        case Some(vFrom) =>
          Some(t -> Snapshot.changeFeed(spark, t, vFrom, vTo))
        case None =>
          // bootstrap: the full resolved state at the window end, as
          // insert events in the changeFeed row shape
          Some(t -> Snapshot.readSnapshot(spark, t, vTo)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(vTo)))
      }
    }
    Some(TxnDelta(appliedTxn, to, tables))
  }

  /** The consumer's applied-txn watermark (0 before the first
    * successful window). */
  def appliedTxn(spark: SparkSession, checkpointDir: String): Int = {
    val fs = new Path(checkpointDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val p = new Path(s"$checkpointDir/applied-txn")
    if (!fs.exists(p)) 0
    else Snapshot.readTextLines(fs, p.toString).head.trim.toInt
  }

  private def advance(spark: SparkSession, checkpointDir: String,
                      to: Int): Unit = {
    val fs = new Path(checkpointDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(checkpointDir))
    Snapshot.writeFileAtomic(fs, s"$checkpointDir/applied-txn",
      s"$checkpointDir/.applied-txn.tmp", Seq(to.toString))
  }

  /** Consume every transaction committed after the checkpoint's
    * watermark in ≤`maxTxnsPerBatch`-txn windows: invoke `process`,
    * then advance the watermark (rename-committed). One consumer per
    * checkpoint directory; `process` must be idempotent per window — a
    * crash between process and advance replays the window verbatim on
    * the next pump. Returns the number of windows processed. */
  def pump(spark: SparkSession, txnRoot: String, checkpointDir: String,
           maxTxnsPerBatch: Int = Int.MaxValue)
          (process: TxnDelta => Unit): Int = {
    require(maxTxnsPerBatch >= 1,
      s"maxTxnsPerBatch must be >= 1, got $maxTxnsPerBatch")
    SnapshotTxn.recover(spark, txnRoot)
    val head = SnapshotTxn.latestTxn(spark, txnRoot)
    var applied = appliedTxn(spark, checkpointDir)
    var n = 0
    while (applied < head) {
      val to = math.min(applied.toLong + maxTxnsPerBatch, head.toLong).toInt
      changesSince(spark, txnRoot, applied, Some(to)).foreach(process)
      advance(spark, checkpointDir, to)
      applied = to
      n += 1
    }
    n
  }
}
