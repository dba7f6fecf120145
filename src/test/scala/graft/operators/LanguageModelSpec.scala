package graft.operators

import graft.SparkSpec
import org.scalactic.Tolerance._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // doc1 "a b a b": bigrams (a,b)(b,a)(a,b); doc2 "a b c": (a,b)(b,c);
  // doc3 "x" has < 2 tokens and must vanish. Corpus counts: c(a,b)=3,
  // c(b,a)=1, c(b,c)=1; c(a,·)=3, c(b,·)=2; V = |{b,a,c}| = 3.
  private def corpus = Seq(
    (1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")

  test("bigramScore: Laplace-smoothed means match hand computation") {
    // p(b|a) = (3+1)/(3+3) = 2/3; p(a|b) = p(c|b) = (1+1)/(2+3) = 2/5
    // doc1 = (2/3 + 2/5 + 2/3)/3 = 26/45 → 0.5778
    // doc2 = (2/3 + 2/5)/2 = 8/15 → 0.5333
    val r = rows(LanguageModel.bigramScore(corpus, "doc_id", "text")
      .orderBy("id"))
    assert(r === Seq(Seq(1L, 3L, 0.5778), Seq(2L, 2L, 0.5333)))
  }

  test("bigramLogScore matches a driver-side log2 recomputation") {
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val exp1 = (lg2(2.0 / 3) + lg2(2.0 / 5) + lg2(2.0 / 3)) / 3
    val exp2 = (lg2(2.0 / 3) + lg2(2.0 / 5)) / 2
    val r = LanguageModel.bigramLogScore(corpus, "doc_id", "text")
      .orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // rounded to 4 decimals by the operator; recompute to the same grid
    assert(r(0).getDouble(2) === math.rint(exp1 * 1e4) / 1e4 +- 1e-4)
    assert(r(1).getDouble(2) === math.rint(exp2 * 1e4) / 1e4 +- 1e-4)
  }

  test("fluent text outscores token soup under the corpus's own statistics") {
    val docs = ((1 to 20).map(i => (i.toLong, "the cat sat on the mat")) :+
      (99L, "zq vx the qz cat xv")).toDF("doc_id", "text")
    val s = LanguageModel.bigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) > s(99L),
      s"fluent ${s(1L)} should beat garbage ${s(99L)}")
  }

  test("negative alpha is rejected loudly") {
    intercept[IllegalArgumentException] {
      LanguageModel.bigramScore(corpus, "doc_id", "text", alpha = -0.5)
    }
  }
}
