package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def run(before: Seq[(Long, Option[String], Long)],
                  after: Seq[(Long, Option[String], Long)]) =
    Snapshot.diff(
        before.toDF("k", "s", "v"), after.toDF("k", "s", "v"),
        Seq("k"), Seq(col("s"), col("v")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("classifies added, removed, changed; drops unchanged") {
    val got = run(
      before = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, Some("c"), 30L)),
      after = Seq((1L, Some("a"), 10L), (2L, Some("B"), 20L), (4L, Some("d"), 40L)))
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null never collides with a string value (sentinel encoding)") {
    val got = run(
      before = Seq((1L, None, 1L), (2L, Some("null"), 1L)),
      after = Seq((1L, Some("null"), 1L), (2L, None, 1L)))
    assert(got === Map(1L -> "changed", 2L -> "changed"))
    // and null vs null is unchanged
    assert(run(Seq((3L, None, 7L)), Seq((3L, None, 7L))) === Map.empty)
  }

  test("column order matters to the fingerprint, values do not smear") {
    // ("ab", "c") vs ("a", "bc") must differ — field separator holds
    val b = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val a = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val got = Snapshot.diff(b, a, Seq("k"), Seq(col("x"), col("y")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "changed"))
  }

  test("the join carries fingerprints, not the compared row") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val b = Seq((1L, "a", 1L)).toDF("k", "s", "v")
    val joins = Snapshot.diff(b, b, Seq("k"), Seq(col("s"), col("v")))
      .queryExecution.optimizedPlan.collect {
        case j: Join => j.children.map(_.output.map(_.name).toSet)
      }
    assert(joins === Seq(Seq(Set("k", "__fp_b"), Set("k", "__fp_a"))),
      "each join side must project exactly (key, fingerprint)")
  }
}
