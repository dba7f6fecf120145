package graft.functions

import graft.SparkSpec

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "the cat and the dog have been seen with many others of that kind"

  private def run(docs: Seq[(Long, String)]): Map[Long, Map[String, Any]] = {
    val df = QualityRules.flags(docs.toDF("doc_id", "text"), "doc_id", "text")
    val names = df.columns
    df.collect().map { r =>
      r.getLong(0) -> names.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
    }.toMap
  }

  test("a fluent document passes every rule") {
    val f = run(Seq((1L, good)))(1L)
    assert(f("keep") === true, s"expected all-pass, got $f")
  }

  test("each rule fails on its targeted pathology, and only keep flips") {
    val docs = Seq(
      2L -> "of the", // word count < 3
      3L -> "a b c d e f g h i j k l the of to and", // mean word len < 3
      4L -> "the cat of ### and ### dog ### went ### to ### town ###", // symbols
      5L -> (1 to 10).map(i => s"- the item of $i and to").mkString("\n"), // bullets
      6L -> Seq("the cat of...", "and the dog to...", "went home...", "fine",
        "also fine").take(5).mkString("\n"), // >30% ellipsis line ends
      7L -> "the of 1 2 3 4 5 6 7 8 9 10 11 12", // alpha fraction < 0.8
      8L -> "purple monkey dishwasher runs quickly forever") // no stopwords
    val f = run(docs)
    assert(f(2L)("r_word_count") === false && f(2L)("keep") === false)
    assert(f(3L)("r_mean_word_len") === false && f(3L)("keep") === false)
    assert(f(4L)("r_symbol_ratio") === false && f(4L)("keep") === false)
    assert(f(5L)("r_bullet_lines") === false && f(5L)("keep") === false)
    assert(f(6L)("r_ellipsis_lines") === false && f(6L)("keep") === false)
    assert(f(7L)("r_alpha_words") === false && f(7L)("keep") === false)
    assert(f(8L)("r_stopwords") === false && f(8L)("keep") === false)
  }

  test("empty text neither crashes nor passes (word count rejects)") {
    val f = run(Seq((9L, "")))(9L)
    assert(f("n_words") === 0L)
    assert(f("r_word_count") === false && f("keep") === false)
  }

  test("blocklistCounts: whole-token matching, total vs distinct hits") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.tokens
    val df = Seq(
      (1L, "bad words bad class"), // 'bad' twice; 'class' must NOT trip 'ass'
      (2L, "clean text only"),
      (3L, "ass bad")).toDF("doc_id", "text")
      .select(col("doc_id"), tokens(col("text")).as("tk"))
    val cs = QualityRules.blocklistCounts(col("tk"), Seq("bad", "ass"))
    val got = df.select(col("doc_id") +: cs.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((2L, 1L)), "substring 'class' must not match 'ass'")
    assert(got(2L) === ((0L, 0L)))
    assert(got(3L) === ((2L, 2L)))
  }
}
