package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: match each left row to the LATEST right row of
  * the same key with `t_right <= t_left` — point-in-time enrichment
  * (prices as of a trade, config as of an event). Spark has no built-in;
  * the scalable shape is NOT a per-row probe or a range join but the
  * union + ordered carry-forward trick: tag both sides, union them, and
  * run one `last(_, ignoreNulls)` window per key ordered by (t, side) —
  * a single shuffle on the key, linear work, no correlated anything.
  * At 100 TB of left rows this costs exactly one sort-shuffle, same as
  * any groupBy — the plan a range-join formulation would never give you.
  */
object AsOf {
  /** Left rows enriched with `carry` columns from the latest right row at
    * or before the left row's `t` (null when no right row precedes).
    * Also emits `__rt`, the matched right row's `t`, for lag computation.
    *
    * Caller contract: the right side is unique per (key, t) — pre-
    * aggregate duplicates first, or "latest" at a tied timestamp is not
    * well-defined and results become run-dependent. (Deliberately not
    * enforced here: the check would cost a second aggregate over the
    * right side on every call.) */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, t: String,
               carry: Seq[String]): DataFrame = {
    // side 0 sorts before side 1 at equal t: a right row AT the left
    // row's timestamp is visible to it (inclusive <= semantics, matching
    // DuckDB/pandas ASOF).
    val r = right.withColumn("__side", lit(0)).withColumn("__rt", col(t))
    val l = left.withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(t), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (carry :+ "__rt").foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
  }
}
