package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deleteVariants1: itself plus each single deletion, deduped") {
    val got = Seq("abca").toDF("s")
      .select(Joins.deleteVariants1(col("s"))).head().getSeq[String](0)
    assert(got.toSet === Set("abca", "bca", "aca", "abc", "aba"))
    val empty = Seq("").toDF("s")
      .select(Joins.deleteVariants1(col("s"))).head().getSeq[String](0)
    assert(empty === Seq(""))
  }

  test("fuzzyJoin1 finds exactly the distance<=1 pairs (vs brute force)") {
    val words = Seq("cat", "cut", "cart", "at", "dog", "dig", "dogs",
      "house", "mouse", "horse", "ca", "c", "")
    val l = words.toDF("a")
    val r = words.toDF("b")
    val got = Joins.fuzzyJoin1(l, "a", r, "b")
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for (a <- words; b <- words if lev(a, b) <= 1) yield (a, b)).toSet
    assert(got === brute,
      s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("candidates come from the equi-join only (no cartesian in the plan)") {
    val l = Seq("cat").toDF("a")
    val plan = Joins.fuzzyJoin1(l, "a", l.toDF("b"), "b")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join Cross") && !plan.contains("CartesianProduct"),
      s"fuzzy join must block on variants:\n$plan")
  }
}
