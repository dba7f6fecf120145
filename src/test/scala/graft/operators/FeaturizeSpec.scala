package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

class FeaturizeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark scans fast spark joins fast"),
    (2L, "spark scans fast spark joins fast"), // exact duplicate of 1
    (3L, "completely different words entirely"),
    (4L, "")                                    // no tokens at all
  ).toDF("doc_id", "text")

  test("hashEmbed: dense dim-length integer vectors, zero vector for empty doc") {
    val r = Featurize.hashEmbed(docs, "doc_id", tokens(col("text")), 16)
      .orderBy("id").collect()
    assert(r.length == 4, "every input doc keeps a row")
    for (row <- r) assert(row.getSeq[Long](1).length == 16)
    val empty = r.find(_.getLong(0) == 4L).get
    assert(empty.getSeq[Long](1).forall(_ == 0L) && empty.getLong(2) == 0L,
      "tokenless doc must embed as the zero vector")
    // sum of |components| is bounded by token count (signs can cancel)
    val d1 = r.find(_.getLong(0) == 1L).get.getSeq[Long](1)
    assert(d1.map(math.abs).sum <= 6 && d1.map(math.abs).sum > 0)
  }

  test("identical texts embed identically; vectors are run-deterministic") {
    val a = Featurize.hashEmbed(docs, "doc_id", tokens(col("text")), 32)
      .orderBy("id").collect().map(_.getSeq[Long](1))
    val b = Featurize.hashEmbed(docs, "doc_id", tokens(col("text")), 32)
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(a.toSeq.map(_.toSeq) === b.toSeq.map(_.toSeq))
    assert(a(0) === a(1), "duplicate docs must share a vector")
    assert(a(0) !== a(2), "distinct texts should not collide at dim 32")
  }

  test("hashed vectors feed the ANN surface: duplicate doc is its own top-1") {
    val emb = Featurize.hashEmbed(docs.filter(col("doc_id") =!= 4), "doc_id",
        tokens(col("text")), 32)
      .select(col("id").as("vec_id"), Featurize.asFloatVec(col("vec")).as("embedding"),
        lit(0).as("label"))
    val q = emb.filter(col("vec_id") === 1).select(col("embedding").as("qv"))
    val top = Similarity.bruteForceKnn(emb, "vec_id", "embedding", q, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3))
    // doc 2 is an exact duplicate of doc 1: both rank with cosine 1.0
    assert(top.map(_._1).toSet == Set(1L, 2L))
    assert(top.forall(_._2 == 1.0))
  }

  test("pmiPairs: windowed in-row pair generation, canonical order, counts") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    // "b a" co-occurs twice (window 2 reaches over one gap token);
    // pairs normalize to (a, b) regardless of surface order
    val docs = Seq("a x b", "b a").toDF("text")
      .select(tokens(col("text")).as("tk"))
    val got = Featurize.pmiPairs(docs, col("tk"), window = 2, minCount = 1, totalTokens = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // N=5; c_a=2, c_b=2, c_x=1
    assert(got(("a", "b")) === ((2L, 2L, 2L, 25000L))) // 2*5*1e4/(2*2)
    assert(got(("a", "x")) === ((1L, 2L, 1L, 25000L)))
    assert(got(("b", "x")) === ((1L, 2L, 1L, 25000L)))
    // window bound respected: no pair from positions 1->3 at window 1
    val w1 = Featurize.pmiPairs(docs, col("tk"), window = 1, minCount = 1, totalTokens = 5L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(w1 === Set(("a", "x"), ("b", "x"), ("a", "b")))
  }

  test("negativeSamples: deterministic, excludes self and same-key, first-k order") {
    import graft.functions.TextFunctions.shaHash32
    val n = 50L
    val emb = (0L until n).map(i => (i, (i % 5).toInt)).toDF("id", "lab")
    val anchors = emb.filter(col("id") % 10 === 0)
    def run() = Featurize.negativeSamples(emb, "id", "lab", anchors,
        n, k = 3, attempts = 12)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getInt(4)))
    val a = run()
    assert(a.toSeq === run().toSeq, "sampling must be run-deterministic")
    for ((anchor, _, _, cand, candLab) <- a) {
      assert(cand != anchor, "self must never be a negative")
      assert(candLab != (anchor % 5).toInt, "exclusion key must hold")
      assert(cand >= 0 && cand < n)
    }
    val perAnchor = a.groupBy(_._1)
    for ((anchor, rows) <- perAnchor) {
      assert(rows.length <= 3)
      assert(rows.map(_._2).sorted.sameElements(1 to rows.length),
        s"ranks must be dense from 1 for $anchor")
      // first-k-by-attempt: attempt order must be increasing with rank
      assert(rows.sortBy(_._2).map(_._3).sameElements(
        rows.map(_._3).sorted), s"attempt order violated for $anchor")
    }
    // probes replay the documented arithmetic
    val probe0 = a.find(r => r._2 == 1).get
    val expected = emb.sparkSession.range(1)
      .select(shaHash32(concat(lit(s"neg:${probe0._1}:"),
        lit(probe0._3.toString))) % n).head().getLong(0)
    assert(probe0._4 === expected)
  }

  test("pmiPairs ranks a genuine collocation above independent tokens") {
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    // 'new york' always adjacent; fillers also occur AWAY from the
    // collocation so their conditional association is genuinely weaker
    val docs = ((0 until 20).map(i => s"new york f$i g${i % 3}") ++
        (0 until 20).map(i => s"g${i % 3} h$i")).toDF("text")
      .select(tokens(col("text")).as("tk"))
    val top = Featurize.pmiPairs(docs, col("tk"), 2, 2, totalTokens = 120L)
      .orderBy(col("pmi4").desc, col("a"), col("b")).limit(1)
      .collect().map(r => (r.getString(0), r.getString(1))).head
    assert(top === (("new", "york")))
  }
}
