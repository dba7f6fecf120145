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

class StupidBackoffSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // model "a b c a b d": trigrams abc bca cab abd; c2ctx (a,b)=2 (b,c)=1
  // (c,a)=1; back-off bigrams (slots 2-3) bc ca ab bd; c1ctx b=2 c=1 a=1;
  // unigrams (slot 3) c a b d; N=4.
  private def corpus = Seq(
    (1L, "a b c a b d", true),
    (10L, "a b c x", false),   // trigram hit 1/2, then full OOV → 0
    (11L, "x a b d y", false), // backoff-bigram 0.4·(1/1), trigram 1/2, OOV
    (12L, "q q c", false)      // backoff-unigram 0.16·(1/4)
  ).toDF("doc_id", "text", "mdl")

  test("all four back-off branches match the hand computation") {
    val r = LanguageModel.stupidBackoff(corpus, "doc_id", "text", col("mdl"))
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.toSeq === Seq((10L, 2L, 0.25), (11L, 3L, 0.3), (12L, 1L, 0.04)))
  }

  test("model-like text outscores alien text") {
    val docs = ((1 to 10).map(i => (i.toLong, "the cat sat on the mat", true)) ++
      Seq((90L, "the cat sat on a rug", false),
          (91L, "zz qq ww ee rr tt", false))).toDF("doc_id", "text", "mdl")
    val s = LanguageModel.stupidBackoff(docs, "doc_id", "text", col("mdl"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(90L) > s(91L), s"expected near-model > alien, got $s")
    assert(s(91L) === 0.0)
  }

  test("empty model corpus fails loudly; alpha bounds enforced") {
    intercept[IllegalArgumentException] {
      LanguageModel.stupidBackoff(corpus, "doc_id", "text", lit(false))
        .collect()
    }
    intercept[IllegalArgumentException] {
      LanguageModel.stupidBackoff(corpus, "doc_id", "text", col("mdl"),
        alpha = 1.5)
    }
  }
}
