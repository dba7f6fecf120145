package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // training shingles: doc 1 fully inside the eval set, doc 2 half in,
  // doc 3 disjoint; eval set = hashes 100..199 plus noise
  private def fixtures = {
    val evalSh = (100L to 199L).toDF("h")
    val train = Seq(
      (1L, Seq(100L, 101L, 102L, 103L)),            // overlap 1.0
      (2L, Seq(104L, 105L, 9001L, 9002L)),          // overlap 0.5
      (3L, Seq(9101L, 9102L, 9103L, 9104L)))        // overlap 0.0
      .toDF("id", "hs")
      .select(col("id"), explode(col("hs")).as("h"))
    (train, evalSh)
  }

  test("bloom overlap: NO false negatives — flags at least the exact hits") {
    val (train, evalSh) = fixtures
    val r = Decontaminate.bloomOverlap(train, evalSh,
        threshold = 0.8, expectedItems = 200)
      .orderBy("doc_id")
      .select("doc_id", "overlap", "contaminated")
      .as[(Long, Double, Boolean)].collect()
    // bloom can only ADD hits (≤ fpp of clean shingles), never drop one
    assert(r(0) === ((1L, 1.0, true)))
    assert(r(1)._2 >= 0.5 && !r(1)._3)
    assert(r(2)._2 >= 0.0)
  }

  test("bloom overlap tracks the exact join within fpp on a larger corpus") {
    val evalSh = (0L until 2000L).map(_ * 7L).toDF("h")
    val evalSet = (0L until 2000L).map(_ * 7L).toSet
    val train = (0L until 500L).flatMap { id =>
      (0L until 40L).map(j => (id, id * 1000L + j * 13L))
    }.toDF("id", "h")
    val got = Decontaminate.bloomOverlap(train, evalSh,
        threshold = 0.8, expectedItems = 2000, fpp = 0.01)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    val exact = (0L until 500L).map { id =>
      id -> (0L until 40L).count(j => evalSet(id * 1000L + j * 13L)).toLong
    }.toMap
    val inflation = got.map { case (id, n) => n - exact(id) }
    assert(inflation.forall(_ >= 0), "bloom dropped a true hit")
    // 500 docs x 40 shingles at 1% fpp → expected ~200 extra hits total;
    // assert a loose 5x bound so the suite never flaps
    assert(inflation.sum <= 1000, s"fpp blowout: ${inflation.sum} extras")
  }

  test("the broadcast is the sketch, not the set: size is fpp-bounded") {
    // 1% fpp ≈ 9.6 bits/element regardless of element SIZE — the whole
    // point vs broadcasting the distinct hash set itself
    val bf = (0L until 100000L).toDF("h").stat.bloomFilter("h", 100000, 0.01)
    assert(bf.bitSize() <= 100000L * 12)
  }
}
