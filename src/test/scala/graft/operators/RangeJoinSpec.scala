package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals the naive inequality join, bin-boundary cases included") {
    // deterministic pseudo-random points/intervals with values placed to
    // cross bin boundaries, touch exact start (inclusive) and exact end
    // (exclusive), and include empty intervals (end <= start)
    val points = (0L until 400L).map(i => (i, (i * 37L) % 1000L)).toDF("pid", "t")
    val intervals = (0L until 60L).map { j =>
      val s = (j * 61L) % 950L
      val len = Seq(-10L, 0L, 7L, 100L, 333L)(((j % 5L).toInt))
      (j, s, s + len)
    }.toDF("iid", "ws", "we")
    val binned = Joins.rangeJoinBinned(points, intervals, "t", "ws", "we",
        binWidth = 64L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = intervals.as("i").join(points.as("p"),
        col("p.t") >= col("i.ws") && col("p.t") < col("i.we"))
      .select(col("i.iid"), col("p.pid")).as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("the binned plan is an equi-join: no nested-loop, no cartesian") {
    val points = (0L until 50L).map(i => (i, i * 3L)).toDF("pid", "t")
    val intervals = (0L until 5L).map(j => (j, j * 20L, j * 20L + 15L))
      .toDF("iid", "ws", "we")
    val plan = Joins.rangeJoinBinned(points, intervals, "t", "ws", "we", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"range join fell back:\n$plan")
    // while the naive inequality join genuinely does fall back
    val naivePlan = intervals.join(points,
        col("t") >= col("ws") && col("t") < col("we"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }

  test("nanos-scale longs above 2^53 bin exactly (no double-precision loss)") {
    // raw nanos epochs ~1.7e18 lose low bits through a double; points are
    // placed ON and 1ns AROUND bin boundaries where a lossy quotient
    // flips the bin and silently drops the pair
    val w = 3600L * 1000000000L // 1 h in nanos
    val base = 1700000000000000000L - (1700000000000000000L % w) // exact boundary
    val points = Seq(
      (1L, base - 1L), (2L, base), (3L, base + 1L),
      (4L, base + w - 1L), (5L, base + w), (6L, base + 2 * w + 12345L))
      .toDF("pid", "t")
    val intervals = Seq((10L, base, base + w), (11L, base - w, base),
      (12L, base + w, base + 3 * w)).toDF("iid", "ws", "we")
    val binned = Joins.rangeJoinBinned(points, intervals, "t", "ws", "we", w)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    val naive = intervals.as("i").join(points.as("p"),
        col("p.t") >= col("i.ws") && col("p.t") < col("i.we"))
      .select(col("i.iid"), col("p.pid")).as[(Long, Long)].collect().toSet
    assert(binned === naive)
    assert(binned === Set((10L, 2L), (10L, 3L), (10L, 4L), (11L, 1L),
      (12L, 5L), (12L, 6L)))
  }

  test("a point pairs with a spanning interval exactly once (no dedup pass needed)") {
    val points = Seq((1L, 100L)).toDF("pid", "t")
    val intervals = Seq((7L, 0L, 1000L)).toDF("iid", "ws", "we") // spans many bins
    val got = Joins.rangeJoinBinned(points, intervals, "t", "ws", "we", 10L)
      .select("iid", "pid").collect()
    assert(got.length === 1)
  }
}
