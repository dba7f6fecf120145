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
}
