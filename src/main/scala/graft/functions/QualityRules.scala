package graft.functions

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * Appendix A1.1) — the standard rule-based pre-filter a pretraining
  * pipeline runs before any model-based scoring: cheap structural
  * checks that drop boilerplate, listings, and shredded text.
  *
  * Exactness discipline: every rule is an INTEGER cross-multiplication
  * against its threshold (e.g. "symbol ratio ≤ 0.1" becomes
  * `10·n_symbols ≤ n_words`), so the gate row (q_gopher) carries only
  * longs and booleans — no float ever reaches the hash. All counts are
  * scan-stage column expressions over the token/line arrays; at 100 TB
  * the whole filter is one pass inside whole-stage codegen, no shuffle.
  *
  * Thresholds are the paper's; `minWords` defaults far below the
  * paper's 50 because the gate corpus has short documents — deployments
  * pass the paper values.
  */
object QualityRules {

  /** The paper's "must contain ≥ 2 of" stopword list. */
  val MustHaveStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** All rule columns over a text column, as (name, boolean-pass). The
    * token/line arrays must be PROJECTED columns (the lambda-CSE rule —
    * see [[graft.operators.LanguageModel]]); use [[flags]] for the
    * packaged form. */
  def rules(tk: Column, lines: Column, text: Column,
            minWords: Int, maxWords: Int): Seq[(String, Column)] = {
    val nWords = size(tk).cast("long")
    val nLines = size(lines).cast("long")
    val totalChars = aggregate(transform(tk, t => length(t).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nHash = (length(text) - length(regexp_replace(text, "#", "")))
      .cast("long")
    val nEllipsis = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3).cast("long")
    val nBullet = size(filter(lines, l => l.rlike("^\\s*[-*•]")))
      .cast("long")
    val nEllipsisEnd = size(filter(lines, l => l.rlike("\\.\\.\\.$")))
      .cast("long")
    val nAlpha = size(filter(tk, t => t.rlike("[a-zA-Z]"))).cast("long")
    val nStop = size(array_intersect(
      array_distinct(transform(tk, lower(_))),
      typedLit(MustHaveStopwords))).cast("long")
    Seq(
      "r_word_count" -> (nWords >= minWords && nWords <= maxWords),
      // mean word length in [3, 10] chars
      "r_mean_word_len" -> (totalChars >= nWords * 3 &&
        totalChars <= nWords * 10),
      // symbol (# or ...) to word ratio <= 0.1
      "r_symbol_ratio" -> ((nHash + nEllipsis) * 10 <= nWords),
      // <= 90% of lines start with a bullet
      "r_bullet_lines" -> (nBullet * 10 <= nLines * 9),
      // <= 30% of lines end with an ellipsis
      "r_ellipsis_lines" -> (nEllipsisEnd * 10 <= nLines * 3),
      // >= 80% of words contain an alphabetic character
      "r_alpha_words" -> (nAlpha * 5 >= nWords * 4),
      // >= 2 distinct must-have stopwords
      "r_stopwords" -> (nStop >= 2))
  }

  /** Blocklist counts over a token array — the C4-style banned-word
    * filter (Raffel et al. 2020 dropped any page containing a term from
    * a public blocklist): `n_hits` = total blocklisted-token
    * occurrences, `n_distinct` = distinct blocklisted tokens present,
    * `keep` = no hit. Matching is exact whole-token (case handled by
    * the caller's tokenization), NOT substring — "class" never trips a
    * blocklist containing "ass". The list rides as an array literal in
    * the scan stage: for the few-hundred-term lists these filters use,
    * `array_intersect`/`filter` beat an explode+join (zero shuffle);
    * for corpus-sized term sets, [[graft.operators.Decontaminate]]'s
    * broadcast semi-join is the companion shape. */
  def blocklistCounts(tk: Column, words: Seq[String]): Seq[(String, Column)] = {
    require(words.nonEmpty, "empty blocklist")
    val lst = array(words.map(lit): _*)
    Seq(
      "n_hits" -> size(filter(tk, t => array_contains(lst, t))).cast("long"),
      "n_distinct" -> size(array_intersect(array_distinct(tk), lst)).cast("long"))
  }

  /** (doc frame) -> id, n_words, the seven rule flags, and `keep` =
    * AND of all rules. One projection, pure scan stage. */
  def flags(docs: org.apache.spark.sql.DataFrame, idCol: String,
            textCol: String, minWords: Int = 3,
            maxWords: Int = 100000): org.apache.spark.sql.DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__t"),
      tokens(col(textCol)).as("__tk"), split(col(textCol), "\n").as("__ln"))
    val rs = rules(col("__tk"), col("__ln"), col("__t"), minWords, maxWords)
    base.select(
      col("id") +: size(col("__tk")).cast("long").as("n_words") +:
        rs.map { case (n, c) => c.as(n) } :+
        rs.map(_._2).reduce(_ && _).as("keep"): _*)
  }
}
