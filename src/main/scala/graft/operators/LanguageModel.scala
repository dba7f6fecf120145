package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
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
  *    (integer counts → IEEE divide/add → a fixed LEFT-TO-RIGHT fold of
  *    the per-position terms) is bit-identical across engines, so the
  *    DuckDB gate replays it hash-exactly — while libm's ln may differ
  *    in the last ulp between engines.
  *  - [[bigramLogScore]]: mean log2 transition probability — the
  *    standard LM filtering form (monotone to perplexity: ppl =
  *    2^(-score)). Engine-internal (log has no cross-engine twin);
  *    LanguageModelSpec pins it to a driver-side recomputation instead.
  *
  * Scale shape: one explode over the token stream feeds two
  * partial-aggregated groupBys (bigram and left-context counts — the
  * shuffled volume is the bigram VOCABULARY, not the corpus), and the
  * stream joins both count tables by key (plain equi-joins: at corpus
  * scale the bigram table outgrows a broadcast, and nothing here needs
  * one). The per-document mean re-shuffles by doc id once. Smoothing's
  * vocabulary size V resolves through a bounded one-row driver read
  * (the data-dependent-config pattern of q_embdup_auto).
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
    // The bigram stream feeds four consumers (both count tables, the V
    // read, and the probe side of the joins) — materialize it once.
    val bi = bigrams(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n12"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    // Bounded driver read: ONE row — the smoothing denominator's V.
    val v = bi.agg(countDistinct(col("w2"))).head().getLong(0)
    val p = (col("n12") + lit(alpha)) / (col("n1") + lit(alpha) * lit(v))
    val term = if (logBase2) log2(p) else p
    bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("id"), col("pos"), term.as("t"))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("pos"), col("t"))).as("ts"),
        count(lit(1)).as("n_bigrams"))
      .select(col("id"), col("n_bigrams"),
        // positions are unique per doc, so the struct sort is total and
        // the fold order — hence the float sum — is deterministic AND
        // engine-replayable (list(t ORDER BY pos) + list_reduce in the
        // oracle walks the same sequence)
        round(aggregate(transform(array_sort(col("ts")), s => s.getField("t")),
          lit(0.0), (acc, x) => acc + x) / col("n_bigrams"), 4).as("lm_score"))
  }

  /** (id, pos, w1, w2) — positional bigrams from the whitespace token
    * stream; documents with fewer than two tokens have none. Array-side
    * pairing (transform over an index sequence): no window shuffle, the
    * pairs materialize inside the scan stage. */
  private def bigrams(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val tks = tokens(col(textCol))
    docs.filter(size(tks) >= 2)
      .select(col(idCol).as("id"),
        explode(transform(sequence(lit(0), size(tks) - 2), i =>
          struct(i.as("pos"),
            element_at(tks, i + 1).as("w1"),
            element_at(tks, i + 2).as("w2")))).as("b"))
      .select(col("id"), col("b.pos").as("pos"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
  }
}
