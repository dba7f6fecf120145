package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(agg: Seq[(String, Long, Long, Option[Double])],
                  lo: Long, hi: Long) =
    TimeSeries.fillForward(agg.toDF("k", "p", "n", "v"),
        "k", "p", "n", "v", lo, hi)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap

  test("holes fill with zero counts and carried-forward values") {
    val got = run(Seq(
      ("a", 1L, 2L, Some(10.0)), ("a", 3L, 1L, Some(30.0))), 0L, 4L)
    assert(got(("a", 0L)) === ((0L, None)), "pre-first-observation stays null")
    assert(got(("a", 1L)) === ((2L, Some(10.0))))
    assert(got(("a", 2L)) === ((0L, Some(10.0))), "hole carries value forward")
    assert(got(("a", 3L)) === ((1L, Some(30.0))))
    assert(got(("a", 4L)) === ((0L, Some(30.0))))
  }

  test("every key gets the full grid; keys never leak across each other") {
    val got = run(Seq(
      ("a", 0L, 1L, Some(1.0)), ("b", 2L, 1L, Some(9.0))), 0L, 2L)
    assert(got.size === 6)
    assert(got(("b", 0L)) === ((0L, None)),
      "key b must not inherit key a's value")
    assert(got(("b", 2L)) === ((1L, Some(9.0))))
    assert(got(("a", 2L)) === ((0L, Some(1.0))))
  }

  test("grid explodes the range, never a cross-join node") {
    val plan = TimeSeries.fillForward(
        Seq(("a", 1L, 1L, 1.0)).toDF("k", "p", "n", "v"),
        "k", "p", "n", "v", 0L, 9L)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join Cross") && !plan.contains("CartesianProduct"),
      s"grid must come from explode, got:\n$plan")
  }

  test("mergeIntervals: overlap and touch merge; gaps split; keys isolated") {
    val iv = Seq(
      ("a", 1L, 5L), ("a", 3L, 8L),  // overlap → one island [1,8]
      ("a", 8L, 10L),                // touches (start = prev end) → merges
      ("a", 12L, 14L),               // gap → new island
      ("b", 2L, 3L)                  // other key independent
    ).toDF("k", "s", "e")
    val got = TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("a", 1L) -> ((1L, 10L, 3L)),
      ("a", 2L) -> ((12L, 14L, 1L)),
      ("b", 1L) -> ((2L, 3L, 1L))))
  }

  test("mergeIntervals: contained and duplicate intervals collapse into the island") {
    val iv = Seq(("k", 0L, 20L), ("k", 5L, 7L), ("k", 5L, 7L), ("k", 21L, 22L))
      .toDF("k", "s", "e")
    val got = TimeSeries.mergeIntervals(iv, "k", "s", "e")
      .orderBy("episode")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // [5,7] twice is contained in [0,20]; start 21 > max end 20 → new island
    assert(got.toSeq === Seq((1L, 0L, 20L, 3L), (2L, 21L, 22L, 1L)))
  }
}
