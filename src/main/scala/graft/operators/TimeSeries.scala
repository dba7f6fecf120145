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
}
