package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("hub with more in-links outranks leaves; exact fixed-point values") {
    // star: a,b,c -> hub; hub -> a  (so nobody dangles except b,c)
    val e = Seq(("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"))
      .toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", iters = 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // iter1: contrib(x)=1000000 each; hub gets 150000 + 85*3000000/100
    assert(r("hub") == 150000L + (85L * 3000000L) / 100L)
    assert(r("a") == 150000L + (85L * 1000000L) / 100L)
    // b and c dangle in-degree-wise: teleport base only
    assert(r("b") == 150000L && r("c") == 150000L)
  }

  test("iterations are deterministic and integer-exact across reruns") {
    val e = (1 to 50).map(i => (s"n${i % 7}", s"n${(i * 3) % 7}")).toDF("s", "d")
    val a = Graph.pageRank(e, "s", "d", 3).orderBy("node").collect().toSeq
    val b = Graph.pageRank(e, "s", "d", 3).orderBy("node").collect().toSeq
    assert(a === b)
  }

  test("parallel edges count per-edge in both contribution and out-degree") {
    val e = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", 1)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // out(a)=3, contrib per edge = 1000000/3 = 333333
    assert(r("b") == 150000L + (85L * 2 * 333333L) / 100L)
    assert(r("c") == 150000L + (85L * 333333L) / 100L)
  }

  test("dangling nodes keep the teleport base and never NPE") {
    val e = Seq(("a", "sink")).toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", 2)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set("a", "sink"))
    assert(r("a") == 150000L, "no in-links -> teleport base")
  }

  test("triangleCounts: K4 gives 3 per node; square gives none") {
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)).toDF("x", "y")
    val got = Graph.triangleCounts(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("x", "y")
    assert(Graph.triangleCounts(square).isEmpty)
  }

  test("degree-oriented count equals the naive 3-join on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 400).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val e = edges.toDF("x", "y")
    val got = Graph.triangleCounts(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: all id-ordered triples
    val set = edges.toSet
    val nodes = edges.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val brute = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- nodes; b <- nodes if a < b && set((a, b))
      c <- nodes if b < c && set((b, c)) && set((a, c))
    } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
    assert(got === brute.toMap, "orientation must not change the count")
  }

  test("a high-degree hub does not explode wedge volume (orientation works)") {
    // star: hub connected to 200 leaves, no triangles at all
    val star = (1L to 200L).map(i => (math.min(0L, i), math.max(0L, i)))
      .toDF("x", "y")
    assert(Graph.triangleCounts(star).isEmpty)
  }
}
