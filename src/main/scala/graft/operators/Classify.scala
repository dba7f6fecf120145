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

  /** MULTI-class hashed-feature Naive Bayes, the fastText-style
    * language identifier (Joulin et al., "Bag of Tricks for Efficient
    * Text Classification"): features hash into `buckets` slots and the
    * model is the per-(bucket, class) weight table — fully integral
    * (gate-replayable): per (bucket, class) weight
    * w = floor(log2(x³)) with x = max(1, ((c+1)·2²⁰) / (N_c+buckets))
    * — integer division and a bit-length log, i.e. the smoothed NB
    * log-likelihood quantized to ⅓ bit. Unlike a hard per-bucket
    * winner vote, shared features contribute their MARGIN, which is
    * what separates closely-related languages (fr/es: measured 0.85 →
    * 1.00 held-out on the langid fixture). x ≤ 2²⁰ so x³ ≤ 2⁶⁰ never
    * overflows; the x≥1 clamp floors rare-class weights at 0 once
    * N_c+buckets exceeds (c+1)·2²⁰ (~10⁶ occurrences — at that corpus
    * scale raise the shift or use [[logScore]]-style doubles outside
    * the gate). Weights exist for EVERY bucket (the c = 0 smoothing
    * value included), so scoring is total.
    *
    * Scale shape: one explode + one aggregate whose key space is
    * `buckets` (map-side partial combine collapses the corpus to ≤
    * buckets rows before the shuffle); the collect is bounded by
    * `buckets`, and the model broadcasts as literal arrays — scoring
    * is then a pure scan stage. */
  def trainHashedNbWeights(train: DataFrame, gramCol: Column,
                           labelCol: Column, classes: Seq[String],
                           buckets: Int): Array[Array[Long]] = {
    val k = classes.length
    val cnt = train.select(labelCol.as("__y"), explode(gramCol).as("g"))
      .select(col("__y"),
        pmod(graft.functions.TextFunctions.shaHash32(col("g")),
          lit(buckets)).as("b"))
      .groupBy("b")
      .agg(sum(when(col("__y") === classes.head, 1L).otherwise(0L))
          .as(s"c_${classes.head}"),
        classes.tail.map(c =>
          sum(when(col("__y") === c, 1L).otherwise(0L)).as(s"c_$c")): _*)
      .collect() // bounded: ≤ buckets rows of k counts
    val tot = Array.fill(k)(0L)
    cnt.foreach(r => (0 until k).foreach(i => tot(i) += r.getLong(i + 1)))
    def weight(c: Long, i: Int): Long = {
      val x = math.max(((c + 1L) << 20) / (tot(i) + buckets), 1L)
      val x3 = x * x * x
      63L - java.lang.Long.numberOfLeadingZeros(x3)
    }
    val w = Array.tabulate(k)(i => Array.fill(buckets)(weight(0L, i)))
    cnt.foreach { r =>
      val b = r.getLong(0).toInt
      (0 until k).foreach(i => w(i)(b) = weight(r.getLong(i + 1), i))
    }
    w
  }

  /** Score with [[trainHashedNbWeights]]: per-class integer
    * log-likelihood sums + argmax prediction (ties to `classes`
    * order). The per-class weight tables ride the plan as literal
    * arrays — a broadcast-weights SCAN stage folding one
    * `aggregate()` per class over the gram buckets; no join, no
    * shuffle beyond the caller's own. */
  def hashedNbScores(docs: DataFrame, idCol: String, gramCol: Column,
                     weights: Array[Array[Long]], classes: Seq[String],
                     buckets: Int): DataFrame = {
    val bks = transform(gramCol, x =>
      pmod(graft.functions.TextFunctions.shaHash32(x), lit(buckets)))
    val scored = docs.select(col(idCol) +: classes.zipWithIndex.map {
      case (c, i) =>
        val wlit = typedLit(weights(i).toSeq)
        aggregate(bks, lit(0L), (acc, b) =>
          acc + element_at(wlit, (b + 1).cast("int"))).as(s"score_$c")
    }: _*)
    val pred = classes.init.zipWithIndex.foldLeft(
        when(lit(false), lit(""))) { case (acc, (c, i)) =>
      acc.when(classes.drop(i + 1)
        .map(o => col(s"score_$c") >= col(s"score_$o"))
        .reduce(_ && _), c)
    }.otherwise(classes.last)
    scored.withColumn("lang_pred", pred)
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
