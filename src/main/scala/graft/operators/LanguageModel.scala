package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-trained bigram language model scoring — the fluency signal of
  * an LLM-data quality pipeline (KenLM-style perplexity filtering,
  * re-expressed over the corpus's own transition counts so no external
  * model artifact is needed): documents whose token transitions are
  * improbable under the corpus's bigram statistics (OCR shred, mojibake,
  * column soup, interleaved text) score low and get filtered or
  * down-weighted in curation mixes.
  *
  * Two shapes, one contract — the engine's exact/deployable dual:
  *
  *  - [[bigramScore]] (gate: q_lmscore): mean Laplace-smoothed
  *    transition PROBABILITY per document. Deliberately ln-free, same
  *    rationale as q_keywords' tf/df ranking: every arithmetic step
  *    (integer counts → IEEE divide/multiply → a fixed left-to-right
  *    fold of per-bigram-TYPE terms in (w1, w2) order) is bit-identical
  *    across engines, so the DuckDB gate replays it hash-exactly —
  *    while libm's ln may differ in the last ulp between engines.
  *  - [[bigramLogScore]]: mean log2 transition probability — the
  *    standard LM filtering form (monotone to perplexity: ppl =
  *    2^(-score)). Engine-internal (log has no cross-engine twin);
  *    LanguageModelSpec pins it to a driver-side recomputation instead.
  *
  * Scale shape: mean p over positions equals Σ m·p / Σ m over bigram
  * TYPES (m = in-doc multiplicity), so the token stream is collapsed to
  * per-(doc, w1, w2) counts by ONE partial-aggregated full-stream
  * shuffle and everything downstream — corpus counts, the probability
  * joins, the per-doc fold — runs at type granularity, a small fraction
  * of stream size on natural text. (A first positional draft joined the
  * count tables back onto the raw stream: three full-stream shuffles,
  * measured 12.3x wall for 10x data; this form is what holds linear.)
  * The count-table joins stay plain equi-joins: at corpus scale the
  * bigram table outgrows a broadcast, and nothing here needs one.
  * Smoothing's vocabulary size V resolves through a bounded one-row
  * driver read (the data-dependent-config pattern of q_embdup_auto).
  */
object LanguageModel {

  /** (id, n_bigrams, lm_score): mean Laplace-smoothed bigram transition
    * probability of each document with at least one bigram, under the
    * corpus's own counts: p(w2|w1) = (c(w1,w2) + alpha) / (c(w1,·) +
    * alpha·V), V = distinct successor vocabulary. Rounded to 4 decimals
    * (the hash-gate float convention). */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  alpha: Double = 1.0): DataFrame =
    scored(docs, idCol, textCol, alpha, logBase2 = false)

  /** Mean log2 p(w2|w1) — the perplexity-equivalent deployable form;
    * see class doc for why it stays outside the hash gate. */
  def bigramLogScore(docs: DataFrame, idCol: String, textCol: String,
                     alpha: Double = 1.0): DataFrame =
    scored(docs, idCol, textCol, alpha, logBase2 = true)

  private def scored(docs: DataFrame, idCol: String, textCol: String,
                     alpha: Double, logBase2: Boolean): DataFrame = {
    require(alpha >= 0, s"alpha must be non-negative, got $alpha")
    // ONE full-stream shuffle: collapse the token stream to in-doc
    // bigram-type multiplicities (map-side combine absorbs in-partition
    // repeats). d2 then feeds three type-granularity consumers — the
    // corpus count rollups and the probe side of the joins.
    val d2 = bigrams(docs, idCol, textCol)
      .groupBy(col("id"), col("w1"), col("w2")).agg(count(lit(1)).as("m"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c2 = d2.groupBy(col("w1"), col("w2")).agg(sum(col("m")).as("n12"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c1 = c2.groupBy(col("w1")).agg(sum(col("n12")).as("n1"))
    // Bounded driver read: ONE row — the smoothing denominator's V.
    val v = c2.agg(countDistinct(col("w2"))).head().getLong(0)
    val p = (col("n12") + lit(alpha)) / (col("n1") + lit(alpha) * lit(v))
    val term = if (logBase2) log2(p) else p
    d2.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("id"), col("w1"), col("w2"),
        (col("m") * term).as("t"), col("m"))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("w1"), col("w2"), col("t"))).as("ts"),
        sum(col("m")).as("n_bigrams"))
      .select(col("id"), col("n_bigrams"),
        // (w1, w2) is unique per doc, so the struct sort is total and
        // the fold order — hence the float sum — is deterministic AND
        // engine-replayable (list(t ORDER BY w1, w2) + list_reduce in
        // the oracle walks the same sequence; both engines compare
        // strings bytewise)
        round(aggregate(transform(array_sort(col("ts")), s => s.getField("t")),
          lit(0.0), (acc, x) => acc + x) / col("n_bigrams"), 4).as("lm_score"))
  }

  /** Stupid Backoff trigram scoring (Brants et al., "Large Language
    * Models in Machine Translation", EMNLP 2007) — the smoothing DESIGNED
    * for distributed trillion-token pipelines: no normalization pass, no
    * held-out tuning, just raw relative frequencies with a fixed 0.4
    * back-off factor, which is why it's the LM-filtering shape that
    * actually runs at 100 TB. The model is trained on the `isModel`
    * sub-corpus and scores the REST (train-on-self makes back-off dead
    * code — every observed trigram has count ≥ 1), so unseen trigrams
    * genuinely fall back: trigram c3/c2, else 0.4·(bigram c2'/c1'),
    * else 0.4²·(unigram c1''/N), else 0 (OOV word).
    *
    * Gate form (q_sbo): mean per-position score, same ln-free discipline
    * as [[bigramScore]] — integer counts, one CASE over three IEEE
    * ratios, a (w1,w2,w3)-ordered fold over per-trigram-TYPE terms. The
    * per-position stream collapses to types with multiplicity first
    * (the lmscore lesson), so every count join runs at type granularity.
    * Returns (id, n_trigrams, sbo_score) for scored docs with ≥ 1
    * trigram. */
  def stupidBackoff(docs: DataFrame, idCol: String, textCol: String,
                    isModel: Column, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val tri = trigrams(docs, idCol, textCol, isModel)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Model-side count tables: trigram, its bigram context (w1,w2),
    // the back-off bigram (w2,w3), its unigram context (w2), the
    // unigram (w3), and N — each a partial-agg rollup of the stream.
    val m = tri.filter(col("__model"))
    val c3 = m.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n3"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c2ctx = c3.groupBy("w1", "w2").agg(sum(col("n3")).as("n2ctx"))
    // Back-off tables from the same trigram stream's (w2, w3) slots —
    // counts of bigram TOKEN positions 2..n of model docs. (A doc's
    // first bigram has no trigram row; at corpus scale the boundary
    // terms are negligible and the oracle replays the same convention.)
    val c2 = m.groupBy("w2", "w3").agg(count(lit(1)).as("n2"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c1ctx = c2.groupBy("w2").agg(sum(col("n2")).as("n1ctx"))
    val c1 = m.groupBy("w3").agg(count(lit(1)).as("n1"))
    // Bounded driver read: one row, the model's token-position total.
    val n = m.count()
    require(n > 0, "stupidBackoff: model corpus has no trigrams")
    val d = tri.filter(!col("__model"))
      .groupBy(col("id"), col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("m"))
    val score = when(col("n3").isNotNull,
        col("n3").cast("double") / col("n2ctx"))
      .when(col("n2").isNotNull,
        lit(alpha) * (col("n2").cast("double") / col("n1ctx")))
      .when(col("n1").isNotNull,
        lit(alpha * alpha) * (col("n1").cast("double") / n.toDouble))
      .otherwise(lit(0.0))
    d.join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c2ctx, Seq("w1", "w2"), "left")
      .join(c2, Seq("w2", "w3"), "left")
      .join(c1ctx, Seq("w2"), "left")
      .join(c1, Seq("w3"), "left")
      .select(col("id"), col("w1"), col("w2"), col("w3"),
        (col("m") * score).as("t"), col("m"))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("w1"), col("w2"), col("w3"), col("t"))).as("ts"),
        sum(col("m")).as("n_trigrams"))
      .select(col("id"), col("n_trigrams"),
        // (w1,w2,w3) unique per doc → total struct sort → deterministic
        // AND oracle-replayable float fold, the bigramScore discipline
        round(aggregate(transform(array_sort(col("ts")), s => s.getField("t")),
          lit(0.0), (acc, x) => acc + x) / col("n_trigrams"), 4).as("sbo_score"))
  }

  /** (id, __model, w1, w2, w3) — positional trigram stream; docs with
    * fewer than three tokens have none. Same array-side pairing and
    * lambda-CSE projection rules as [[bigrams]]. */
  private def trigrams(docs: DataFrame, idCol: String, textCol: String,
                       isModel: Column): DataFrame = {
    val tk = col("tk")
    graft.core.Tables.spread( // tokenize+gram+combine parallelism (r17)
        docs.select(col(idCol).as("id"), isModel.as("__model"),
          col(textCol).as("__text")))
      .select(col("id"), col("__model"), tokens(col("__text")).as("tk"))
      .filter(size(tk) >= 3)
      .select(col("id"), col("__model"),
        explode(transform(sequence(lit(0), size(tk) - 3), i =>
          struct(element_at(tk, i + 1).as("w1"),
            element_at(tk, i + 2).as("w2"),
            element_at(tk, i + 3).as("w3")))).as("b"))
      .select(col("id"), col("__model"), col("b.w1").as("w1"),
        col("b.w2").as("w2"), col("b.w3").as("w3"))
  }

  /** (id, w1, w2) — the bigram stream from the whitespace tokens;
    * documents with fewer than two tokens have none. Array-side pairing
    * (transform over an index sequence): no window shuffle, the pairs
    * materialize inside the scan stage and flow straight into the
    * grouped shuffle's map-side combine.
    *
    * The token array is projected into its OWN column first — element_at
    * inside the lambda must index a materialized attribute, not the
    * tokens() expression tree: Catalyst does not CSE subexpressions
    * into lambdas, so indexing the raw expression re-runs the regex
    * split per bigram position, O(tokens²) regex work per document
    * (measured 16x on this very operator: 7.0 s -> 0.43 s at sf0.1).
    * The projection survives CollapseProject because the alias is
    * multiply referenced and non-cheap. */
  private def bigrams(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val tk = col("tk")
    graft.core.Tables.spread( // tokenize+gram+combine parallelism (r17)
        docs.select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), tokens(col("__text")).as("tk"))
      .filter(size(tk) >= 2)
      .select(col("id"),
        explode(transform(sequence(lit(0), size(tk) - 2), i =>
          struct(element_at(tk, i + 1).as("w1"),
            element_at(tk, i + 2).as("w2")))).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
  }
}
