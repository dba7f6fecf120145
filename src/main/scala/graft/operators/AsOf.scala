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

  /** [[asofJoin]] for power-law keys: the time axis is cut into
    * `chunk`-sized ranges and the carry-forward window runs per
    * (key, range) — a key holding 10% of all rows becomes as many
    * parallel tasks as it spans ranges, instead of one straggler task.
    * Rows whose range holds no earlier right row take their carry from a
    * per-(key, range) summary (ONE row per range per key: the range's
    * last right row) cumulated across ranges — the summary window is
    * orders of magnitude smaller than the data, so the hot key's
    * sequential portion shrinks from its row count to its range count.
    *
    * Cost trade vs [[asofJoin]]: one extra shuffle of the big side (the
    * summary join-back) plus a distinct over (key, range) — buy it when
    * key skew makes the single-window straggler the critical path, stay
    * with the one-shuffle variant for well-behaved keys. Same caller
    * contract (right unique per (key, t)); `t` must be a non-negative
    * integral column (ranges come from `t DIV chunk`). Result is
    * row-for-row identical to [[asofJoin]] — AsOfSpec asserts equality
    * on shared fixtures, including the NULL-carry case. */
  def asofJoinChunked(left: DataFrame, right: DataFrame, key: String,
                      t: String, carry: Seq[String], chunk: Long): DataFrame = {
    require(chunk > 0, s"chunk must be positive, got $chunk")
    val carryCols = "__rt" +: carry
    val bucket = expr(s"`$t` DIV $chunk")
    val r = right.withColumn("__side", lit(0)).withColumn("__rt", col(t))
    val l = left.withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__bk", bucket)
    // in-range carry: same ordered window as asofJoin, partitioned by
    // (key, range) so no single task owns a whole hot key
    val wIn = Window.partitionBy(col(key), col("__bk"))
      .orderBy(col(t), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inRange = unioned
      .withColumn("__c", when(col("__side") === 0, struct(carryCols.map(col): _*)))
      .withColumn("__c", last(col("__c"), ignoreNulls = true).over(wIn))
    // per-(key, range) summary: the range's LAST right row (unique-(key,t)
    // contract makes max_by deterministic); left-only ranges join in via
    // the full (key, range) domain so they can inherit an earlier range's
    // carry
    val summary = r.withColumn("__bk", bucket)
      .groupBy(col(key), col("__bk"))
      .agg(max_by(struct(carryCols.map(col): _*), col(t)).as("__last"))
    val domain = unioned.select(col(key), col("__bk")).distinct()
    val wPrev = Window.partitionBy(col(key)).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = domain.join(summary, Seq(key, "__bk"), "left")
      .withColumn("__prev", last(col("__last"), ignoreNulls = true).over(wPrev))
      .select(col(key), col("__bk"), col("__prev"))
    val joined = inRange.filter(col("__side") === 1)
      .join(prev, Seq(key, "__bk"), "left")
      .withColumn("__c", coalesce(col("__c"), col("__prev")))
    val unpacked = carryCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, col("__c").getField(c))
    }
    unpacked.drop("__side", "__bk", "__c", "__prev")
  }
}
