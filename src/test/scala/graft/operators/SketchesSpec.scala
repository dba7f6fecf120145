package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 'a'×50, 'b'×20, 'c'×5, plus 25 distinct rare values ('r0'..'r24')
  private def valuesDf =
    (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c") ++
      (0 until 25).map(i => s"r$i")).toDF("v")

  test("cms estimates never underestimate and hit exact counts when sparse") {
    val depth = 4
    val width = 256
    val sk = Sketches.cmsBuild(valuesDf, "v", depth, width)
    val probes = Seq("a", "b", "c", "r0", "never-seen").toDF("p")
    val est = Sketches.cmsEstimate(probes, "p", sk, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 50L, "b" -> 20L, "c" -> 5L, "r0" -> 1L, "never-seen" -> 0L)
    for ((p, n) <- exact) {
      assert(est(p) >= n, s"CMS underestimated $p: ${est(p)} < $n")
      // 100 items into 4×256 cells: collisions possible but each adds
      // at most the colliding value's count; assert the CMS error bound
      // e·n/width rather than exact equality
      assert(est(p) <= n + (3 * 100) / width + 1,
        s"CMS estimate for $p out of bound: ${est(p)} vs exact $n")
    }
  }

  test("sketch size is bounded by depth*width regardless of input size") {
    val sk = Sketches.cmsBuild(valuesDf, "v", 4, 16)
    assert(sk.count() <= 4 * 16)
    // every value lands in exactly one cell per row
    val perRow = sk.groupBy("row").agg(sum("n").as("t"))
      .collect().map(_.getLong(1)).toSet
    assert(perRow === Set(100L), "each hash row must count every occurrence once")
  }

  test("cell assignment is deterministic and engine-portable (non-negative mod)") {
    val a = Sketches.cmsBuild(valuesDf, "v", 2, 64).orderBy("row", "cell")
    val b = Sketches.cmsBuild(valuesDf, "v", 2, 64).orderBy("row", "cell")
    assert(rows(a) === rows(b))
    assert(a.filter(col("cell") < 0 || col("cell") >= 64).isEmpty,
      "cells must lie in [0, width)")
  }

  test("probe plan broadcasts the sketch (no shuffle of the probe side)") {
    val sk = Sketches.cmsBuild(valuesDf, "v", 4, 256)
    val plan = Sketches.cmsEstimate(Seq("a").toDF("p"), "p", sk, 4, 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
