package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair: the report-facing step after any
  * event aggregation — a (key, period) table with HOLES (periods
  * nobody logged) becomes a dense grid with explicit zeros for counts
  * and last-observation-carried-forward for level metrics. BI tooling
  * and window arithmetic (diffs, moving averages) silently mis-compute
  * over sparse grids; this makes the density explicit.
  *
  * Scale shape: the grid is built by EXPLODING the period range onto
  * the key dimension (keys × P rows — never a cross join node), the
  * observed cells left-join on (key, period), and the carry-forward is
  * one bounded window per key ordered by period. Period count P is a
  * calendar constant; the frame grows with keys only.
  */
object TimeSeries {
  /** Dense (key, period) grid over [lo, hi] for every distinct key in
    * `agg`, left-joined with the observed cells: `cnt` fills 0,
    * `value` carries the last observed value forward (null until the
    * first observation — the honest prefix). `agg` must be one row per
    * (key, period). */
  def fillForward(agg: DataFrame, keyCol: String, periodCol: String,
                  cntCol: String, valCol: String,
                  lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"need lo <= hi; got $lo/$hi")
    val grid = agg.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(lo), lit(hi))).as(periodCol))
    val w = Window.partitionBy(keyCol).orderBy(periodCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq(keyCol, periodCol), "left")
      .select(col(keyCol), col(periodCol),
        coalesce(col(cntCol), lit(0L)).as(cntCol),
        last(col(valCol), ignoreNulls = true).over(w).as(valCol))
  }

  /** Merge overlapping/touching CLOSED intervals per key (the
    * gaps-and-islands step behind "activity episodes", coverage
    * windows, validity-range compaction): input rows `(key, start,
    * end)` collapse into maximal islands — a row starts a new island
    * iff its start exceeds the running max end of every earlier row in
    * key order (touching intervals, start = prevEnd, DO merge: closed
    * semantics). Returns one row per island: `key, episode (1-based
    * per key), start, end, n_rows`.
    *
    * Scale shape: ONE shuffle by key feeds both window passes (running
    * max-end flag, then the running island-id sum share the same sort)
    * plus the per-(key, island) fold — per-key cost is the sort; no
    * self-join, no interval cross product. Skewed keys degrade that
    * key's task only. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("__new",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("episode",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("episode"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_rows"))
  }
}
