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
    * right side on every call.)
    *
    * Skew contract: the window runs one ordered pass per key, so a
    * pathologically hot key (one key holding a large fraction of all
    * rows) becomes a single-task straggler — work stays linear in that
    * key's rows (no blowup), but wall-clock is bounded by the hottest
    * key. For power-law keys, pre-split the key (e.g. salt by coarse
    * time range and stitch the boundary carry) before calling. */
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
    // Carry ONE struct of all right-side fields, not one last() per
    // column: per-column carries would let a NULL in one carry column
    // fall through to an OLDER right row's value while __rt comes from
    // the newer row — mixing fields across right rows. The struct is
    // non-null whenever a right row exists, so last(ignoreNulls) picks
    // the whole matched row atomically and genuine NULLs inside it
    // survive (DuckDB/pandas ASOF semantics). Also: one window function
    // instead of N.
    val carryCols = "__rt" +: carry
    val packed = unioned.withColumn("__carry",
      when(col("__side") === 0, struct(carryCols.map(col): _*)))
    val carried = packed
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
    val unpacked = carryCols.foldLeft(carried) { (df, c) =>
      df.withColumn(c, col("__carry").getField(c))
    }
    unpacked.filter(col("__side") === 1).drop("__side", "__carry")
  }
}
