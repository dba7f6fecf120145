package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality classification without an external model: binary
  * (per-doc distinct token) Naive Bayes — the fastText-style linear
  * quality filter a pretraining pipeline trains on "known good vs known
  * bad" seeds (CCNet / LLaMA-style wiki-vs-crawl filtering), here
  * trainable from any boolean label column (e.g. the Gopher rule
  * verdict as a pseudo-label, which is exactly how weak-supervision
  * bootstraps a learned filter from a rule-based one).
  *
  * Two scoring paths, the house dual:
  *
  *  - [[voteScore]] — the GATE form: each vocab token in a doc votes
  *    ±1 by comparing its Laplace-smoothed class likelihoods with exact
  *    BIGINT cross-multiplication ((c⁺+1)·(N⁻+V) vs (c⁻+1)·(N⁺+V)) —
  *    no division, no logarithm, nothing floats, so any engine replays
  *    the decision bit-for-bit. A vote classifier is a linear model
  *    with sign weights (a coarser margin than NB's log-odds, same
  *    decision direction per feature).
  *  - [[logScore]] — the DEPLOYABLE form: the actual NB log-odds score
  *    Σ ln(P(tok|+)/P(tok|−)) + ln(prior odds) — better calibrated,
  *    but ln ulps differ across libm builds, so it is spec-pinned (to
  *    the vote path on separable data), not hash-gated — the same
  *    split as simhash64/xxhash64 and bm25's ln twin.
  *
  * Scale shape: training is one explode + one partial-aggregated
  * groupBy(token) — shuffle bounded by vocabulary, not corpus; the
  * totals are ONE driver row. Scoring joins exploded test tokens to
  * the model on token (vocabulary-bounded side; Spark broadcasts it
  * when stats allow) and folds per doc with a second partial agg. The
  * label spine is preserved: docs with no vocab token score 0/0 and
  * default to the positive class (pred = pos ≥ neg).
  */
object Classify {
  /** Corpus-level training constants: token-occurrence totals per class
    * (binary counts: each distinct token counted once per doc), vocab
    * size, and per-class doc counts for the prior. */
  case class NbModelTotals(nPos: Long, nNeg: Long, vocab: Long,
                           docsPos: Long, docsNeg: Long)

  /** Train on `docs` with boolean `labelCol`: returns the per-token
    * count frame (tok, c_pos, c_neg) and the totals (TWO bounded driver
    * reads of one aggregate row each). */
  def trainNaiveBayes(docs: DataFrame, tokCol: Column,
                      labelCol: Column): (DataFrame, NbModelTotals) = {
    val ex = docs.select(labelCol.as("__y"),
        explode(array_distinct(tokCol)).as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("c_neg"))
    val t = ex.agg(sum("c_pos"), sum("c_neg"), count(lit(1))).head()
    val d = docs.agg(sum(when(labelCol, 1L).otherwise(0L)),
      sum(when(labelCol, 0L).otherwise(1L))).head()
    (ex, NbModelTotals(t.getLong(0), t.getLong(1), t.getLong(2),
      d.getLong(0), d.getLong(1)))
  }

  /** Gate-form scoring: (id, pos_votes, neg_votes, pred). Integer
    * cross-multiplied likelihood comparison per (doc, vocab token);
    * every test doc keeps a row (0/0 votes when no token is in vocab).
    * Products stay inside signed-64 for any corpus where
    * (maxClassCount+1)·(N+V) < 2^63 — beyond ~10^9 distinct tokens a
    * deployment shifts to [[logScore]] anyway. */
  def voteScore(test: DataFrame, idCol: String, tokCol: Column,
                model: DataFrame, t: NbModelTotals): DataFrame = {
    val lhs = (col("c_pos") + 1) * lit(t.nNeg + t.vocab)
    val rhs = (col("c_neg") + 1) * lit(t.nPos + t.vocab)
    val votes = test
      .select(col(idCol).as("id"), explode(array_distinct(tokCol)).as("tok"))
      .join(model, Seq("tok"))
      .withColumn("vote",
        when(lhs > rhs, 1L).when(lhs < rhs, -1L).otherwise(0L))
      .groupBy("id")
      .agg(sum(when(col("vote") === 1, 1L).otherwise(0L)).as("pos_votes"),
        sum(when(col("vote") === -1, 1L).otherwise(0L)).as("neg_votes"))
    test.select(col(idCol).as("id")).join(votes, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("pos_votes"), lit(0L)).as("pos_votes"),
        coalesce(col("neg_votes"), lit(0L)).as("neg_votes"))
      .withColumn("pred", col("pos_votes") >= col("neg_votes"))
  }

  /** Deployable scoring: the smoothed NB log-odds
    * Σ ln((c⁺+1)/(N⁺+V)) − ln((c⁻+1)/(N⁻+V)) + ln((D⁺+1)/(D⁻+1)).
    * Returns (id, score, pred). Not hash-gated (ln); ClassifySpec pins
    * its decisions to [[voteScore]] on separable corpora. */
  def logScore(test: DataFrame, idCol: String, tokCol: Column,
               model: DataFrame, t: NbModelTotals): DataFrame = {
    val w = log((col("c_pos") + 1).cast("double") / (t.nPos + t.vocab)) -
      log((col("c_neg") + 1).cast("double") / (t.nNeg + t.vocab))
    val prior = math.log((t.docsPos + 1).toDouble / (t.docsNeg + 1).toDouble)
    val scores = test
      .select(col(idCol).as("id"), explode(array_distinct(tokCol)).as("tok"))
      .join(model, Seq("tok"))
      .groupBy("id").agg(sum(w).as("__s"))
    test.select(col(idCol).as("id")).join(scores, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("__s"), lit(0.0)) + prior).as("score"))
      .withColumn("pred", col("score") >= 0)
  }
}
