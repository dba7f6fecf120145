package graft.operators

import graft.functions.TextFunctions.{shaHash32, shaHash64, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Data selection via importance resampling (DSIR) — pick the raw-corpus
  * documents that look most like a small curated target corpus, the
  * standard pretraining-data selection step (Xie et al., "Data Selection
  * for Language Models via Importance Resampling", NeurIPS 2023). Both
  * corpora are modeled as bags of hashed token features; a document's
  * importance weight is how much more likely its tokens are under the
  * target's (Laplace-smoothed) feature distribution than under the raw
  * corpus's own.
  *
  * Two shapes, one contract — the same exact/deployable dual as
  * [[LanguageModel]]:
  *
  *  - [[importanceScore]] (gate: q_dsir): mean per-position probability
  *    RATIO p_t(b)/p_r(b). Deliberately ln-free: integer counts, IEEE
  *    multiply/divide on a fixed expression tree, and a left-to-right
  *    fold of per-bucket-TYPE terms in bucket order — every step is
  *    bit-identical across engines, so the DuckDB oracle replays it
  *    hash-exactly (libm's ln may differ in the last ulp; a product of
  *    hundreds of ratios also overflows doubles, which is exactly why
  *    the paper works in log space — and why the gate form averages
  *    instead).
  *  - [[logImportance]]: the paper's log importance weight log w(x) =
  *    Σ_b n_b(x)·(ln p_t(b) − ln p_r(b)) — the deployable form
  *    (engine-internal; DsirSpec pins it to a driver-side recompute).
  *    [[gumbelTopK]] adds the paper's Gumbel-top-k resampling with
  *    hash-seeded noise, so selection is sampled-without-replacement
  *    yet fully deterministic per seed.
  *
  * Scale shape: the token stream is collapsed once to per-(doc, bucket)
  * multiplicities (ONE partial-aggregated full-stream shuffle — the
  * lmscore lesson); the two corpus histograms are bucket-bounded (≤ B
  * rows each, B = 2^10..2^20), so the probability joins probe tiny
  * tables and the per-doc fold runs at type granularity. Selection is
  * sort+limit → TakeOrderedAndProject (per-partition heaps, no global
  * single-partition window). At 100 TB the only full-stream pass is the
  * scan-stage hash + the one combine shuffle.
  */
object Dsir {

  /** (id, n_toks, iw) for every NON-target document: iw = mean over
    * token positions of p_t(bucket)/p_r(bucket), rounded to 4 decimals
    * (the hash-gate float convention). `isTarget` marks the curated
    * corpus rows; raw = the complement, which is also what's scored
    * (selecting target docs is a no-op — they're already in). Laplace
    * α on both models keeps unseen buckets finite. */
  def importanceScore(docs: DataFrame, idCol: String, textCol: String,
                      isTarget: Column, buckets: Int = 1024,
                      alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val occ = occurrences(docs, idCol, textCol, isTarget, buckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val d = occ.filter(!col("__tgt"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("m"))
    val ct = occ.filter(col("__tgt")).groupBy(col("b"))
      .agg(count(lit(1)).as("ct"))
    val cr = occ.filter(!col("__tgt")).groupBy(col("b"))
      .agg(count(lit(1)).as("cr"))
    // Bounded driver read: the two corpus totals (the data-dependent
    // config pattern — one row, two longs).
    val totals = occ.agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)),
      sum(when(!col("__tgt"), 1L).otherwise(0L))).head()
    val nt = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val nr = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    require(nt > 0, "DSIR: target corpus has no token occurrences")
    require(nr > 0, "DSIR: raw corpus has no token occurrences")
    // r_b = p_t(b)/p_r(b) = ((ct+α)·(nr+αB)) / ((cr+α)·(nt+αB)).
    // Fixed expression tree, doubles throughout: both engines evaluate
    // the identical op sequence, so the quotient is bit-identical.
    val r = ((coalesce(col("ct"), lit(0L)).cast("double") + alpha) *
        lit(nr.toDouble + alpha * buckets)) /
      ((col("cr").cast("double") + alpha) *
        lit(nt.toDouble + alpha * buckets))
    // d's buckets all appear in cr (same rows aggregated), so the cr
    // join is inner; ct is left+coalesce (bucket may be unseen in the
    // target).
    d.join(cr, Seq("b")).join(ct, Seq("b"), "left")
      .select(col("id"), col("b"), (col("m") * r).as("t"), col("m"))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("b"), col("t"))).as("ts"),
        sum(col("m")).as("n_toks"))
      .select(col("id"), col("n_toks"),
        // bucket is unique per doc → the struct sort is total and the
        // float fold order is deterministic AND oracle-replayable
        // (list(t ORDER BY b) + list_reduce walks the same sequence)
        round(aggregate(transform(array_sort(col("ts")), s => s.getField("t")),
          lit(0.0), (acc, x) => acc + x) / col("n_toks"), 4).as("iw"))
  }

  /** Deterministic top-k selection by (iw desc, id) — the paper's top-k
    * ablation and the gate-checkable path. Plans as
    * TakeOrderedAndProject: per-partition k-heaps merged on the driver,
    * never a global sort or single-partition window. */
  def selectTopK(scored: DataFrame, k: Int): DataFrame =
    scored.orderBy(col("iw").desc, col("id")).limit(k)

  /** The paper's log importance weight per non-target doc:
    * lw = Σ_types m_b·(ln p_t(b) − ln p_r(b)). Deployable form (ranking
    * is the log of the true likelihood ratio, additive across positions,
    * no overflow); engine-internal because libm ln has no cross-engine
    * twin — DsirSpec pins it to a driver-side recompute. */
  def logImportance(docs: DataFrame, idCol: String, textCol: String,
                    isTarget: Column, buckets: Int = 1024,
                    alpha: Double = 1.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val occ = occurrences(docs, idCol, textCol, isTarget, buckets)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val d = occ.filter(!col("__tgt"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("m"))
    val ct = occ.filter(col("__tgt")).groupBy(col("b"))
      .agg(count(lit(1)).as("ct"))
    val cr = occ.filter(!col("__tgt")).groupBy(col("b"))
      .agg(count(lit(1)).as("cr"))
    val totals = occ.agg(
      sum(when(col("__tgt"), 1L).otherwise(0L)),
      sum(when(!col("__tgt"), 1L).otherwise(0L))).head()
    val nt = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val nr = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    require(nt > 0, "DSIR: target corpus has no token occurrences")
    require(nr > 0, "DSIR: raw corpus has no token occurrences")
    val lpt = log((coalesce(col("ct"), lit(0L)).cast("double") + alpha) /
      lit(nt.toDouble + alpha * buckets))
    val lpr = log((col("cr").cast("double") + alpha) /
      lit(nr.toDouble + alpha * buckets))
    d.join(cr, Seq("b")).join(ct, Seq("b"), "left")
      .select(col("id"), (col("m") * (lpt - lpr)).as("t"), col("m"))
      .groupBy(col("id"))
      .agg(sum(col("t")).as("lw"), sum(col("m")).as("n_toks"))
      .select(col("id"), col("n_toks"), col("lw"))
  }

  /** Gumbel-top-k resampling over log weights: add an independent
    * Gumbel(0,1) draw to each doc's lw and take the k largest — exactly
    * a weighted sample WITHOUT replacement ∝ w(x) (the Gumbel-max
    * trick). The noise is hash-seeded: u = (shaHash64(seed‖id) mod 2^53
    * + 0.5)/2^53 ∈ (0,1), g = −ln(−ln u) — deterministic per (seed, id),
    * so a re-run (or a second engine) reproduces the sample exactly. */
  def gumbelTopK(logWeights: DataFrame, k: Int, seed: Long): DataFrame = {
    val u = ((pmod(shaHash64(concat_ws(" ", lit(seed), col("id"))),
        lit(9007199254740992L)).cast("double") + 0.5) /
      lit(9007199254740992.0))
    val key = col("lw") + (-log(-log(u)))
    logWeights.withColumn("__g", key)
      .orderBy(col("__g").desc, col("id")).limit(k)
      .drop("__g")
  }

  /** (id, __tgt, b): one row per token occurrence, bucketed by the
    * engine-portable sha256-derived 32-bit hash mod B (non-negative in
    * both engines, so plain % replays). The token array is projected
    * into its own column before exploding — the lmscore lesson: lambda
    * bodies don't CSE the tokens() expression tree. */
  private def occurrences(docs: DataFrame, idCol: String, textCol: String,
                          isTarget: Column, buckets: Int): DataFrame =
    docs.select(col(idCol).as("id"), isTarget.as("__tgt"),
        tokens(col(textCol)).as("tk"))
      .select(col("id"), col("__tgt"), explode(col("tk")).as("tok"))
      .select(col("id"), col("__tgt"),
        (shaHash32(col("tok")) % buckets).as("b"))
}
