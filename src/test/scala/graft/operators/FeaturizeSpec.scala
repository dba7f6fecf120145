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
}
