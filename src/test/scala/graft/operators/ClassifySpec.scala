package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // separable corpus: positive docs speak "clean" vocabulary, negative
  // docs speak "spam" vocabulary, with a shared neutral word
  private def train = Seq(
    (1L, "clean clear prose with shared words", true),
    (2L, "clear writing shared and clean text", true),
    // 6 distinct tokens per doc in BOTH classes, so class totals are
    // symmetric and the shared neutral token genuinely votes 0
    (3L, "spam junk casino shared pills cheap", false),
    (4L, "junk casino spam shared offers win", false)
  ).toDF("id", "text", "y")

  private def test_ = Seq(
    (10L, "clean clear text"),
    (11L, "casino spam pills"),
    (12L, "totally unseen vocabulary"),
    (13L, "shared")
  ).toDF("id", "text")

  test("voteScore separates the classes; unseen vocab defaults positive") {
    val (m, t) = Classify.trainNaiveBayes(train, tokens(col("text")), col("y"))
    assert(t.docsPos == 2 && t.docsNeg == 2)
    val r = Classify.voteScore(test_, "id", tokens(col("text")), m, t)
      .orderBy("id").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getBoolean(3))).toMap
    assert(r(10L)._3 === true, s"clean doc must classify positive: ${r(10L)}")
    assert(r(11L)._3 === false, s"spam doc must classify negative: ${r(11L)}")
    assert(r(12L) === ((0L, 0L, true)), "no vocab overlap -> 0/0 votes, default pred")
    // 'shared' appears in both classes equally -> vote 0
    assert(r(13L)._1 == 0 && r(13L)._2 == 0)
  }

  test("logScore (deployable ln twin) agrees with the vote gate on separable docs") {
    val (m, t) = Classify.trainNaiveBayes(train, tokens(col("text")), col("y"))
    val v = Classify.voteScore(test_, "id", tokens(col("text")), m, t)
      .select("id", "pred").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val l = Classify.logScore(test_, "id", tokens(col("text")), m, t)
      .select("id", "pred").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    for (id <- Seq(10L, 11L)) assert(v(id) === l(id), s"paths disagree on doc $id")
  }

  test("binary counting: token multiplicity within a doc counts once") {
    val rep = Seq((1L, "spam spam spam spam", false), (2L, "ok fine", true))
      .toDF("id", "text", "y")
    val (m, _) = Classify.trainNaiveBayes(rep, tokens(col("text")), col("y"))
    val c = m.filter(col("tok") === "spam").head()
    assert(c.getLong(1) == 0 && c.getLong(2) == 1,
      "distinct-per-doc counting must collapse repeats")
  }
}
