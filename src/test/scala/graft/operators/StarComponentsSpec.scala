package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Alternating large-star/small-star CC (Kiveris et al. SoCC'14,
  * Dedup.connectedComponentsStar): must produce exactly
  * connectedComponents' labels on every shape, while converging in
  * O(log n) rounds instead of O(diameter) hops. */
class StarComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, pairs, and min-id labels match the LPA twin") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val r = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("empty pair graph yields an empty assignment") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponentsStar(pairs).count() === 0)
  }

  test("a 200-node path collapses to one component (diameter >> rounds)") {
    // LPA would need ~200 hops here; the star rounds cap at 60, so
    // passing PROVES the doubly-logarithmic contraction actually works.
    val pairs = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val r = Dedup.connectedComponentsStar(pairs).as[(Long, Long)].collect()
    assert(r.length == 200 && r.forall(_._2 == 1L))
  }

  test("self-pairs and reversed/duplicate edges don't lose nodes") {
    val pairs = Seq((5L, 5L), (2L, 1L), (1L, 2L), (2L, 3L))
      .toDF("id_a", "id_b")
    val r = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L))
  }

  test("string ids work (no numeric-label assumption)") {
    val pairs = Seq(("url/b", "url/c"), ("url/c", "url/d"),
      ("url/d", "url/e"), ("url/a", "url/b")).toDF("id_a", "id_b")
    val r = Dedup.connectedComponentsStar(pairs)
      .as[(String, String)].collect().toMap
    assert(r.values.toSet === Set("url/a"))
    assert(r.keySet === Set("url/a", "url/b", "url/c", "url/d", "url/e"))
  }

  test("matches connectedComponents on a random multi-component graph") {
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 300)
      .map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    val lpa = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(star === lpa)
  }
}
