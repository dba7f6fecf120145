package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion: reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR'09) of two independently-ranked candidate lists per
  * query — the standard way a RAG / retrieval pipeline combines a
  * lexical arm (BM25 over an inverted index) with a semantic arm (ANN
  * over embeddings) without having to calibrate their incomparable
  * score scales: each doc contributes Σ 1/(k + rank_arm), rank-only, so
  * an arm's score units never matter.
  *
  * Determinism: 1/(k + rank) is ONE IEEE division of small integers and
  * the fused score is the fixed-order sum of exactly two such terms —
  * every engine computes the identical double, so the fused ORDER (not
  * just the display value) replays bit-for-bit in the oracle. Ties
  * break on doc id.
  *
  * Scale shape: both inputs are already per-query top-n lists (nQueries
  * × n rows — tiny relative to any corpus; the arms themselves come
  * from the index/ANN operators that never scan the corpus per query),
  * so the fusion is a full-outer join + ONE window on qid over bounded
  * rows. Missing-arm docs contribute 0 from that arm, the RRF
  * convention. */
object Retrieval {
  /** Fuse `lex` and `sem` — both (qid, id, rank) with 1-based ranks —
    * into per-query fused top-`topK`:
    * (qid, id, rank, rrf, rank_lex, rank_sem). */
  def rrfFuse(lex: DataFrame, sem: DataFrame, kRrf: Int = 60,
              topK: Int = 10): DataFrame = {
    require(kRrf >= 1 && topK >= 1, s"need kRrf>=1, topK>=1; got $kRrf/$topK")
    val fl = lex.select(col("qid"), col("id"), col("rank").as("rank_lex"))
    val fs = sem.select(col("qid"), col("id"), col("rank").as("rank_sem"))
    val fused = fl.join(fs, Seq("qid", "id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_sem")), lit(0.0)))
    val w = Window.partitionBy("qid").orderBy(col("rrf").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("id"), col("rank"), col("rrf"),
        col("rank_lex"), col("rank_sem"))
  }
}
