package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // key 1: right rows at t=5 and t=20; key 2: right only in the future.
  private val left = Seq(
    (100L, 1L, 10L), // after t=5  -> "a"
    (101L, 1L, 20L), // AT t=20    -> "b" (inclusive <=)
    (102L, 1L, 4L),  // before any -> null
    (103L, 2L, 15L)  // right exists only at t=99 -> null
  ).toDF("event_id", "k", "t")
  private val right = Seq(
    (1L, 5L, "a"), (1L, 20L, "b"), (2L, 99L, "c")
  ).toDF("k", "t", "v")

  test("matches latest right at or before t, null when none precedes") {
    val r = AsOf.asofJoin(left, right, "k", "t", Seq("v"))
      .select("event_id", "v", "__rt").orderBy("event_id")
    assert(rows(r) === Seq(
      Seq(100L, "a", 5L),
      Seq(101L, "b", 20L),
      Seq(102L, null, null),
      Seq(103L, null, null)))
  }

  test("left rows and columns survive unchanged; one shuffle by key") {
    val r = AsOf.asofJoin(left, right, "k", "t", Seq("v"))
    assert(r.count() === 4)
    assert(r.columns.toSet === Set("event_id", "k", "t", "v", "__rt"))
    // the whole operator is one Exchange (the window's key shuffle) —
    // no join node, no second shuffle
    val plan = r.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2, // union reads two sides
      s"as-of carry-forward should shuffle once per side at most:\n$plan")
    assert(!plan.contains("Join"), s"no join node expected:\n$plan")
  }
}
