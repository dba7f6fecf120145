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
}
