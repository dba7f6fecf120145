package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  private def funnel(ev: Seq[(Long, Long, String)], horizon: Long = 1000L) =
    Behavior.windowFunnel(ev.toDF("u", "ts", "ty"), "u",
        col("ts"), col("ty"), steps, horizon)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))), r.getLong(4)))
      .toMap

  test("completes steps in order and picks the FIRST valid time per step") {
    val got = funnel(Seq(
      (1L, 10L, "a"), (1L, 5L, "b"), // b before a: must not count
      (1L, 20L, "b"), (1L, 30L, "b"), // first valid b = 20
      (1L, 25L, "c"), (1L, 40L, "c"))) // c at 25 is before b=20? no, after — 25 > 20 counts
    assert(got(1L) === (((Some(10L), Some(20L), Some(25L)), 3L)))
  }

  test("strictly-after semantics: a same-instant next step does not count") {
    val got = funnel(Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 11L, "b")))
    assert(got(1L) === (((Some(10L), Some(11L), None), 2L)))
  }

  test("horizon anchors at step 0 and bounds every later step") {
    val got = funnel(Seq(
      (1L, 0L, "a"), (1L, 500L, "b"), (1L, 1500L, "c"), // c beyond 0+1000
      (2L, 0L, "a"), (2L, 1500L, "b"))) // b beyond horizon
    assert(got(1L) === (((Some(0L), Some(500L), None), 2L)))
    assert(got(2L) === (((Some(0L), None, None), 1L)))
  }

  test("users that never hit step 0 are absent; non-step events ignored") {
    val got = funnel(Seq(
      (1L, 10L, "b"), (1L, 20L, "c"), // no 'a' ever
      (2L, 10L, "zz"), (2L, 15L, "a")))
    assert(!got.contains(1L))
    assert(got(2L) === (((Some(15L), None, None), 1L)))
  }

  test("funnel matches the min-cascade brute force on random streams") {
    val rnd = new scala.util.Random(7)
    val types = Vector("a", "b", "c", "x")
    val ev = (0 until 2000).map { _ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(300).toLong, types(rnd.nextInt(4)))
    }
    val horizon = 120L
    val got = funnel(ev, horizon)
    // brute force per user
    val byUser = ev.groupBy(_._1)
    for ((u, es) <- byUser) {
      val t0 = es.filter(_._3 == "a").map(_._2).minOption
      val t1 = t0.flatMap(a => es.filter(e => e._3 == "b" && e._2 > a &&
        e._2 <= a + horizon).map(_._2).minOption)
      val t2 = (t0, t1) match {
        case (Some(a), Some(b)) => es.filter(e => e._3 == "c" && e._2 > b &&
          e._2 <= a + horizon).map(_._2).minOption
        case _ => None
      }
      t0 match {
        case None => assert(!got.contains(u), s"user $u should be absent")
        case Some(_) =>
          val reached = 1L + t1.size + t2.size
          assert(got(u) === (((t0, t1, t2), reached)), s"user $u diverged")
      }
    }
  }

  test("funnel is one shuffle: a single exchange below the fold") {
    val df = Behavior.windowFunnel(
      Seq((1L, 10L, "a")).toDF("u", "ts", "ty"), "u",
      col("ts"), col("ty"), steps, 100L)
    val nEx = df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    assert(nEx === 1, "expected exactly one shuffle (groupBy user)")
  }

  test("cohortRetention: anchor week, offsets, pre-anchor exclusion") {
    val ev = Seq(
      // user 1: signup day 3 (cohort 0); active days 2 (excluded), 5, 16
      (1L, 2L, "view"), (1L, 3L, "signup"), (1L, 5L, "view"), (1L, 16L, "view"),
      // user 2: signup day 8 (cohort 1); active day 8 only
      (2L, 8L, "signup"),
      // user 3: never signs up — excluded entirely
      (3L, 1L, "view")).toDF("u", "d", "ty")
    val got = Behavior.cohortRetention(ev, "u", col("d"), col("ty"), "signup", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // user 1: signup d0=3 → cohort 0; events at d=3,5 → offset 0; d=16 → offset 1
    // user 2: d0=8 → cohort 1, offset 0
    assert(got === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (1L, 0L) -> 1L))
  }

  private def naiveRolling(acts: Seq[(Long, Long)], w: Int,
                           lo: Long, hi: Long): Map[Long, Long] =
    (lo to hi).map { d =>
      d -> acts.filter { case (_, day) => day >= d - w + 1 && day <= d }
        .map(_._1).distinct.size.toLong
    }.filter(_._2 > 0).toMap

  test("rollingActives: overlapping activity never double-counts a user") {
    // user 1 active on days 0 and 3 (windows overlap), user 2 on day 10
    val ev = Seq((1L, 0L), (1L, 3L), (1L, 3L), (2L, 10L)).toDF("u", "d")
    val got = Behavior.rollingActives(ev, "u", col("d"), 7, 0L, 12L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naiveRolling(Seq((1L, 0L), (1L, 3L), (2L, 10L)), 7, 0L, 12L))
    // days 0..9 covered by user 1 (0..6 from day0, 3..9 from day3) = 1 each
    assert((0L to 9L).forall(got(_) == 1L))
    assert(got(10L) == 1L && got(11L) == 1L)
    assert(!got.contains(12L) || got(12L) == 1L) // day 10 covers 10..16 clamped
  }

  test("rollingActives matches the naive grid join on random activity") {
    val rnd = new scala.util.Random(41)
    val acts = (0 until 300).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(30).toLong))
    val got = Behavior.rollingActives(acts.toDF("u", "d"), "u", col("d"), 7, 0L, 29L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === naiveRolling(acts.distinct, 7, 0L, 29L))
  }

  test("rollingActives clamps to the requested day range") {
    val ev = Seq((1L, 5L)).toDF("u", "d")
    val got = Behavior.rollingActives(ev, "u", col("d"), 7, 6L, 8L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(6L -> 1L, 7L -> 1L, 8L -> 1L))
  }
}
