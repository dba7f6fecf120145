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

  /** Naive synchronous LPA replica (most-frequent neighbor label, ties
    * to min, parallel edges collapsed) for differential testing. */
  private def naiveLpa(edges: Seq[(String, String)], iters: Int): Map[String, String] = {
    val adj = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).distinct }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lab = adj.map { case (n, nbrs) =>
        val votes = nbrs.map(lab).groupBy(identity).map { case (l, v) => l -> v.size }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("labelPropagation: two cliques with one bridge settle into two communities") {
    val clique = (ns: Seq[String]) =>
      for (a <- ns; b <- ns if a < b) yield (a, b)
    val e = (clique(Seq("a", "b", "c", "d")) ++
      clique(Seq("x", "y", "z", "w")) :+ ("d", "x")).toDF("s", "t")
    val got = Graph.labelPropagation(e, "s", "t", 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the a-clique settles to uniform 'a'; the x-clique exhibits the
    // documented synchronous 2-cycle, so assert the exact round-3 state
    // via the replica rather than a (wrong) hand-computed fixed point
    assert(Set("a", "b", "c", "d").forall(got(_) == "a"))
    val cliqueEdges = e.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === naiveLpa(cliqueEdges, 3))
  }

  test("labelPropagation matches the naive synchronous replica on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val edges = (0 until 120).map { _ =>
        (s"n${rnd.nextInt(25)}", s"n${rnd.nextInt(25)}")
      }.filter(e => e._1 != e._2).distinct
      val got = Graph.labelPropagation(edges.toDF("s", "t"), "s", "t", 4)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got === naiveLpa(edges, 4), s"trial $trial diverged")
    }
  }

  test("labelPropagation: parallel edges vote once; isolated join-key nodes keep labels") {
    // b has TWO parallel edges to a and one to c: one vote each, tie -> a
    val e = Seq(("a", "b"), ("a", "b"), ("b", "c")).toDF("s", "t")
    val got = Graph.labelPropagation(e, "s", "t", 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("b") == "a")
  }

  test("bfsDistance: path layering, min-dist on multiple seeds, hop cutoff") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")).toDF("s", "t")
    val seeds = Seq("a").toDF("node")
    val got = Graph.bfsDistance(e, "s", "t", seeds, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L),
      "e is beyond maxHops and must be absent")
    // two seeds: distances are the min over sources; seed not in graph ok
    val got2 = Graph.bfsDistance(e, "s", "t", Seq("e", "zzz").toDF("node"), 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got2 === Map("e" -> 0L, "zzz" -> 0L, "d" -> 1L, "c" -> 2L))
  }

  test("bfsDistance matches naive BFS on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (0 until 150).map { _ =>
      (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}")
    }.filter(e => e._1 != e._2).distinct
    val adj = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).distinct }
    val seeds = Seq("n0", "n1")
    var dist = seeds.filter(s => adj.contains(s) || true).map(_ -> 0L).toMap
    var frontier = seeds
    for (h <- 1 to 4) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h.toLong)
      frontier = next
    }
    val got = Graph.bfsDistance(edges.toDF("s", "t"), "s", "t",
        seeds.toDF("node"), 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === dist)
  }
}
