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

  test("NULL in the matched right row's carry column survives as NULL") {
    // Right rows for one key: (t=5, v="old", w="W5") then (t=10, v=null,
    // w="W10"). A left row at t=12 matches the t=10 row; v must be NULL
    // (that row's actual value), NOT "old" leaked from the t=5 row —
    // and w/__rt must agree they came from the t=10 row.
    val l = Seq((1L, 7L, 12L)).toDF("event_id", "k", "t")
    val r = Seq((7L, 5L, Option("old"), "W5"), (7L, 10L, None: Option[String], "W10"))
      .toDF("k", "t", "v", "w")
    val out = AsOf.asofJoin(l, r, "k", "t", Seq("v", "w"))
      .select("event_id", "v", "w", "__rt")
    assert(rows(out) === Seq(Seq(1L, null, "W10", 10L)))
  }

  test("hot key (50% of rows on one key) completes; contract documents skew") {
    // One key holds half the corpus: the window runs as a single task for
    // that key — linear in its rows, so it completes, but wall-clock is
    // bounded by the hottest key (documented straggler bound).
    val n = 20000
    val hotLeft = (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) 1L else (i % 50).toLong + 2L, (i % 1000).toLong)
    }.toDF("event_id", "k", "t")
    val hotRight = (0 until 500 by 10).map(t => (1L, t.toLong, s"v$t")) ++
      (2L to 51L).map(k => (k, 0L, s"k$k"))
    val out = AsOf.asofJoin(hotLeft, hotRight.toDF("k", "t", "v"), "k", "t", Seq("v"))
    assert(out.count() === n)
    // spot-check hot-key semantics: t=998 -> latest right at t=490
    val probe = out.filter(col("k") === 1L && col("t") === 998L)
      .select("v").distinct().as[String].collect()
    assert(probe === Array("v490"))
  }

  test("chunked variant is row-identical to the single-window operator") {
    // chunk=7 forces range boundaries through the fixture (t spans 4-99):
    // in-range carries, cross-range inheritance and the no-predecessor
    // case all exercise
    val plain = AsOf.asofJoin(left, right, "k", "t", Seq("v"))
      .select("event_id", "v", "__rt").orderBy("event_id")
    val chunked = AsOf.asofJoinChunked(left, right, "k", "t", Seq("v"), chunk = 7L)
      .select("event_id", "v", "__rt").orderBy("event_id")
    assert(rows(chunked) === rows(plain))
  }

  test("chunked variant: NULL carry values survive across range boundaries") {
    val l = Seq((1L, 7L, 12L), (2L, 7L, 30L)).toDF("event_id", "k", "t")
    val r = Seq((7L, 5L, Option("old"), "W5"), (7L, 10L, None: Option[String], "W10"))
      .toDF("k", "t", "v", "w")
    // chunk=8: right rows land in ranges 0 and 1; left t=30 is in range 3
    // with NO right rows — its carry must come from range 1's last right
    // row, with the NULL v intact (not range 0's "old").
    val out = AsOf.asofJoinChunked(l, r, "k", "t", Seq("v", "w"), chunk = 8L)
      .select("event_id", "v", "w", "__rt").orderBy("event_id")
    assert(rows(out) === Seq(
      Seq(1L, null, "W10", 10L),
      Seq(2L, null, "W10", 10L)))
  }

  test("chunked variant matches on the hot-key corpus") {
    val n = 20000
    val hotLeft = (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) 1L else (i % 50).toLong + 2L, (i % 1000).toLong)
    }.toDF("event_id", "k", "t")
    val hotRight = ((0 until 500 by 10).map(t => (1L, t.toLong, s"v$t")) ++
      (2L to 51L).map(k => (k, 0L, s"k$k"))).toDF("k", "t", "v")
    val plain = AsOf.asofJoin(hotLeft, hotRight, "k", "t", Seq("v"))
      .select("event_id", "v").orderBy("event_id")
    val chunked = AsOf.asofJoinChunked(hotLeft, hotRight, "k", "t", Seq("v"), 100L)
      .select("event_id", "v").orderBy("event_id")
    assert(rows(chunked) === rows(plain))
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
