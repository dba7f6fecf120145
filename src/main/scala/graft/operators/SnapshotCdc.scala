package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** STREAMING CDC over snapshot tables — [[Snapshot.changedBetween]]
  * generalized into the ONE resumable incremental-consumption
  * mechanism every follower of a snapshot table shares (the
  * Delta-as-a-streaming-source story on the manifest layout):
  *
  *  - [[changesSince]] is the verified core: the rows added after an
  *    applied version, by manifest set difference — no data diffed,
  *    O(new files) read — with the APPEND-ONLY contract checked on
  *    every call (a compaction/merge re-states old rows in new files,
  *    which set-difference would double-count; that refuses loudly
  *    instead). An applied version of 0 bootstraps with the full
  *    current snapshot, so consumers need no separate first-run path.
  *  - [[pump]] adds the resumable micro-batch loop: the consumer's
  *    applied-version WATERMARK lives in its checkpoint directory and
  *    advances — atomically, by file rename — only AFTER the
  *    consumer's processor returns. A crash between processing and
  *    the advance replays exactly that version window on the next
  *    pump, so processors must be idempotent per window: consumers
  *    that own a snapshot table get that from the commit-tag pattern
  *    ([[MaterializedView.refreshSumView]]'s `src_v` tag), file-layout
  *    consumers from marker files keyed by the window's end version
  *    (the index refresher).
  *
  * Scale shape: each pump touches O(delta files) data and O(versions)
  * manifest text; a consumer that falls behind chunks the catch-up
  * into `maxVersionsPerBatch`-version windows instead of one giant
  * batch. Retention contract: the source must retain the manifest at
  * the consumer's applied version (vacuum the source only past every
  * consumer's watermark) — the same rule the view refresher always
  * had, now stated once.
  */
object SnapshotCdc {
  /** One CDC window: the rows ADDED to the table in versions
    * (fromVersion, toVersion]. */
  final case class Delta(fromVersion: Int, toVersion: Int, rows: DataFrame)

  /** The verified incremental read: rows added after `applied`, up to
    * `upTo` (default: the current latest). None when nothing new.
    * `applied = 0` returns the full snapshot (bootstrap). Refuses a
    * non-append-only history (files removed between the versions) and
    * tombstoned (merge-on-read) endpoints — reconcile first. */
  def changesSince(spark: SparkSession, srcDir: String, applied: Int,
                   upTo: Option[Int] = None): Option[Delta] = {
    val latest = Snapshot.latestVersion(spark, srcDir)
    val to = upTo.getOrElse(latest)
    require(to <= latest,
      s"requested CDC up to v$to but $srcDir is at v$latest")
    require(applied >= 0 && applied <= to,
      s"applied version v$applied outside [0, $to] for $srcDir")
    if (to == applied) return None
    if (applied == 0)
      return Some(Delta(0, to, Snapshot.readSnapshot(spark, srcDir, to)))
    // append-only verification: every file of the applied version must
    // still be referenced at `to` — otherwise set-difference would
    // double-count the re-stated rows of a compaction/merge/re-Z-order
    val before = Snapshot.manifestLines(spark, srcDir, applied)
      .map(_.split("\t").head).toSet
    val after = Snapshot.manifestLines(spark, srcDir, to)
      .map(_.split("\t").head).toSet
    val removed = before -- after
    require(removed.isEmpty,
      s"source $srcDir is not append-only between v$applied and v$to " +
        s"(${removed.size} file(s) removed — compaction or merge ran); " +
        "CDC consumers must re-bootstrap from a full snapshot")
    Some(Delta(applied, to,
      Snapshot.changedBetween(spark, srcDir, applied, to)))
  }

  /** The consumer's applied-version watermark (0 before the first
    * successful window). */
  def appliedVersion(spark: SparkSession, checkpointDir: String): Int = {
    val fs = new Path(checkpointDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val p = new Path(s"$checkpointDir/applied-version")
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.trim.toInt
    }
  }

  private def advanceWatermark(spark: SparkSession, checkpointDir: String,
                               to: Int): Unit = {
    val fs = new Path(checkpointDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(checkpointDir))
    Snapshot.writeFileAtomic(fs, s"$checkpointDir/applied-version",
      s"$checkpointDir/.applied-version.tmp", Seq(to.toString))
  }

  /** Consume everything committed after the checkpoint's watermark in
    * ≤`maxVersionsPerBatch`-version windows: for each window, invoke
    * `process`, then advance the watermark (rename-committed). Returns
    * the number of windows processed. One consumer per checkpoint
    * directory (the watermark is not a multi-writer CAS); `process`
    * must be idempotent per window — a crash between process and
    * advance replays that window verbatim on the next pump. */
  def pump(spark: SparkSession, srcDir: String, checkpointDir: String,
           maxVersionsPerBatch: Int = Int.MaxValue)
          (process: Delta => Unit): Int =
    pumpWindows(spark, srcDir, checkpointDir, maxVersionsPerBatch) {
      (applied, to) => changesSince(spark, srcDir, applied, Some(to))
        .foreach(process)
    }

  /** [[pump]] for MERGE-ON-READ tables: each window's rows are the
    * CHANGE-FEED events of its version range ([[Snapshot.changeFeed]] —
    * insert/upsert postimages and pure-delete keys, with
    * `_change_type`/`_commit_version` columns), so a downstream applier
    * can follow an upsert table row-by-row where plain [[pump]] (an
    * added-files reader) must refuse tombstones. Same watermark, same
    * resume/replay contract; a window crossing a rewrite
    * (compact/reconcile) refuses loudly like every CDC read. The first
    * window (watermark 0) bootstraps with the RESOLVED full snapshot
    * tagged `_change_type = "insert"`, `_commit_version` = the window
    * end. */
  def pumpFeed(spark: SparkSession, srcDir: String, checkpointDir: String,
               maxVersionsPerBatch: Int = Int.MaxValue)
              (process: Delta => Unit): Int = {
    import org.apache.spark.sql.functions._
    pumpWindows(spark, srcDir, checkpointDir, maxVersionsPerBatch) {
      (applied, to) =>
        val rows =
          if (applied == 0)
            Snapshot.readSnapshot(spark, srcDir, to)
              .withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(to))
          else Snapshot.changeFeed(spark, srcDir, applied, to)
        process(Delta(applied, to, rows))
    }
  }

  private def pumpWindows(spark: SparkSession, srcDir: String,
                          checkpointDir: String, maxVersionsPerBatch: Int)
                         (window: (Int, Int) => Unit): Int = {
    require(maxVersionsPerBatch >= 1,
      s"need maxVersionsPerBatch >= 1, got $maxVersionsPerBatch")
    val latest = Snapshot.latestVersion(spark, srcDir)
    var applied = appliedVersion(spark, checkpointDir)
    var windows = 0
    while (applied < latest) {
      val to = math.min(applied.toLong + maxVersionsPerBatch, latest.toLong).toInt
      window(applied, to)
      advanceWatermark(spark, checkpointDir, to)
      applied = to
      windows += 1
    }
    windows
  }
}
