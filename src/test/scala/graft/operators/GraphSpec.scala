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
}
