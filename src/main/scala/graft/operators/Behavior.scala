package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics — the funnel / cohort queries every
  * product-analytics engine answers over an event stream, shaped for a
  * stream that is 100 TB and a user set that is merely large.
  *
  * [[windowFunnel]] is the ClickHouse-windowFunnel-style ordered-step
  * matcher as ONE shuffle: filter to step events (pushed to the scan),
  * group by user, sort the user's (ts, step) pairs, and run a single
  * left-to-right fold — no per-step join cascade, no window function
  * over the raw stream, state = one k-slot array per user. Per-user
  * event lists are bounded by the step-type filter; a pathological hot
  * user degrades that user's task only.
  */
object Behavior {
  /** First completion time of each funnel step per user: step i+1 must
    * STRICTLY follow step i, and every step must land within
    * `horizonUs` of step 0 (the anchor semantics of windowFunnel).
    * Returns one row per user that reached step 0: `user`, `t0..tk-1`
    * (epoch-micros, null = never reached), `reached` = 1 + highest
    * step index hit. Ties at the same microsecond resolve
    * earlier-step-first (sorted by (ts, step)); strict `>` then keeps a
    * same-instant next step from counting — documented, matched by the
    * oracle's `min(ts > prev)` cascade. */
  def windowFunnel(ev: DataFrame, userCol: String, tsUsCol: Column,
                   typeCol: Column, steps: Seq[String],
                   horizonUs: Long): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct; got $steps")
    val k = steps.size
    val idx = steps.zipWithIndex
      .map { case (s, i) => (lit(s), lit(i)) }
    val stepIdx = idx.tail.foldLeft(when(typeCol === idx.head._1, idx.head._2)) {
      case (acc, (s, i)) => acc.when(typeCol === s, i)
    }
    val grouped = ev
      .filter(typeCol.isin(steps.map(x => x: Any): _*))
      .select(col(userCol).as("user"),
        struct(tsUsCol.cast("long").as("ts"), stepIdx.as("idx")).as("e"))
      .groupBy("user")
      .agg(sort_array(collect_list(col("e"))).as("evs"))
    val init = array((0 until k).map(_ => lit(null).cast("long")): _*)
    val folded = grouped.select(col("user"),
      aggregate(col("evs"), init, (acc, e) => {
        val ts = e.getField("ts")
        val si = e.getField("idx")
        // slot j (0-based) fills when: it's this event's step, still
        // empty, the previous slot is filled strictly earlier, and the
        // anchor horizon holds
        transform(acc, (x, j) => {
          // CASE WHEN branches lazily, so element_at(acc, j) — 1-based,
          // i.e. the PREVIOUS slot — is never evaluated at j = 0 (where
          // index 0 would be an error)
          val prevOk = when(j === 0, lit(true))
            .otherwise(element_at(acc, j).isNotNull && ts > element_at(acc, j))
          val horizonOk = when(j === 0, lit(true))
            .otherwise(ts <= element_at(acc, 1) + horizonUs)
          when(si === j && x.isNull && prevOk && horizonOk, ts).otherwise(x)
        })
      }).as("st"))
    val reached = (1 to k).map(j => when(element_at(col("st"), j).isNotNull, 1L)
      .otherwise(0L)).reduce(_ + _)
    folded
      .filter(element_at(col("st"), 1).isNotNull)
      .select(col("user") +:
        (0 until k).map(j => element_at(col("st"), j + 1).as(s"t$j")) :+
        reached.as("reached"): _*)
  }

  /** Cohort retention: users cohorted by the period of their FIRST
    * `anchorType` event, counted distinct in each later period they
    * were active at all. `dayCol` = integer day index; periods are
    * `periodDays`-wide. Pre-anchor activity is excluded. Two shuffles
    * (anchor min per user, then the cohort-cell count); the per-user
    * anchor frame is one row per user and joins back broadcast-or-hash
    * as the planner sizes it. */
  def cohortRetention(ev: DataFrame, userCol: String, dayCol: Column,
                      typeCol: Column, anchorType: String,
                      periodDays: Int): DataFrame = {
    require(periodDays >= 1, s"need periodDays >= 1; got $periodDays")
    val anchors = ev.filter(typeCol === anchorType)
      .groupBy(col(userCol).as("user"))
      .agg(min(dayCol).as("d0"))
    ev.select(col(userCol).as("user"), dayCol.as("d"))
      .join(anchors, "user")
      .filter(col("d") >= col("d0"))
      .select((col("d0") / periodDays).cast("long").as("cohort"),
        ((col("d") - col("d0")) / periodDays).cast("long").as("offset"),
        col("user"))
      .groupBy("cohort", "offset")
      .agg(countDistinct(col("user")).as("n_users"))
  }

  /** Rolling `window`-day distinct actives (the rolling-WAU/MAU chart):
    * for each day d in [loDay, hiDay], the number of users with ANY
    * activity in [d−window+1, d]. The naive plan — a day-grid range
    * join against the activity table plus count(DISTINCT) — carries
    * every (user, day-in-window) pair through the shuffle (window×
    * activity rows). This plan is linear: per (user, day) first-touch
    * dedup, then each activity day contributes its INCREMENTAL covered
    * interval [max(day, prev+window), day+window−1] via one lag — the
    * union of per-activity cover windows without double counting — and
    * a ≤window-element explode turns intervals into per-day +1s that
    * one partial-aggregated groupBy folds. No distinct aggregation
    * ever sees the grid; shuffle volume is O(activity + days).
    * Bounds are caller-supplied values (one bounded agg row), never an
    * embedded 1-row cross join (keeps the plan BNLJ-free). */
  def rollingActives(ev: DataFrame, userCol: String, dayCol: Column,
                     window: Int, loDay: Long, hiDay: Long): DataFrame = {
    require(window >= 1, s"need window >= 1; got $window")
    require(loDay <= hiDay, s"need loDay <= hiDay; got $loDay/$hiDay")
    val ud = ev.select(col(userCol).as("user"), dayCol.cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy("user").orderBy("day")
    ud.withColumn("prev", lag(col("day"), 1).over(w))
      .select(
        greatest(col("day"),
          coalesce(col("prev") + window, col("day"))).as("lo"),
        (col("day") + window - 1).as("hi"))
      // clamp to the requested day range; empty intervals drop out
      .select(greatest(col("lo"), lit(loDay)).as("lo"),
        least(col("hi"), lit(hiDay)).as("hi"))
      .filter(col("lo") <= col("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
      .groupBy("d").agg(count(lit(1)).as("n_active"))
  }
}
