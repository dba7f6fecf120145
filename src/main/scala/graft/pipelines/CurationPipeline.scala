package graft.pipelines

import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation: the composed large-scale pipeline the
  * BASELINE.json north star asks for — quality gate → language gate →
  * exact dedup → near-dup canonicalization, all on one pass over the
  * corpus plus the dedup joins.
  *
  * Shapes that survive 100 TB: the quality/language stage is pure
  * column expressions on the scan (no shuffle); exact dedup is one
  * hash-groupBy; near-dup reuses the MinHash pipeline (shingles built
  * and persisted once); the final keep-set is two semi/anti joins.
  */
object CurationPipeline {
  /** Per-doc quality/language annotation — no shuffle, stays on scan. */
  def annotate(docs: DataFrame, idCol: String, textCol: String,
               stopwords: Seq[(String, Seq[String])]): DataFrame = {
    // spread (r18): tokenize + per-language stopword scoring fused into
    // a one-row-group scan ran single-task (measured 0.94 s of the
    // q_curate cell); the guard makes this a pass-through on any
    // non-scan-shaped caller frame and at production split counts.
    val spreadDocs = graft.core.Tables.spread(docs)
    val tk = tokens(lower(col(textCol)))
    val scores = stopwords.map { case (lang, words) =>
      size(filter(tk, t => array_contains(typedLit(words), t)))
        .cast("long").as(s"score_$lang")
    }
    val base = spreadDocs.select(
      (col(idCol) +: col(textCol) +: size(tk).cast("long").as("n_tokens") +: scores): _*)
    val pred = stopwords.map(_._1) match {
      case Seq(a, b, c) =>
        when(col(s"score_$a") >= col(s"score_$b") && col(s"score_$a") >= col(s"score_$c"), a)
          .when(col(s"score_$b") >= col(s"score_$c"), b)
          .otherwise(c)
      case langs => langs.map(l => col(s"score_$l")).zip(langs)
        .foldLeft((lit(-1L), lit("und"))) { case ((bs, bl), (s, l)) =>
          (when(s > bs, s).otherwise(bs), when(s > bs, l).otherwise(bl))
        }._2
    }
    base.withColumn("lang_pred", pred)
  }

  /** Full curation: returns the kept corpus (id, n_tokens, lang_pred).
    *
    * @param minTokens  quality gate: minimum whitespace tokens
    * @param keepLang   language gate: predicted language to keep
    * @param threshold  near-dup Jaccard threshold for canonicalization
    * @param maxDf      hot-shingle document-frequency cap for the
    *                   near-dup stage (boilerplate guard)
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             stopwords: Seq[(String, Seq[String])],
             minTokens: Long, keepLang: String,
             threshold: Double = 0.8,
             maxDf: Long = Long.MaxValue): DataFrame = {
    val annotated = annotate(docs, idCol, textCol, stopwords)
    // No persist here (r18): since the exact-dedup stage became one
    // window, the gate has exactly ONE consumer — the annotate scan runs
    // once either way, and the old persist only added a cache write.
    // The SURVIVORS (exactKept, below) stay persisted: they feed both
    // shingle-building and the final anti-join.
    val gated = annotated
      .filter(col("n_tokens") >= minTokens && col("lang_pred") === keepLang)

    // Exact dedup: keep the min id per identical text. One window over
    // hash(sha) replaces the old groupBy(sha) + left-semi join back on
    // id (r18; guide §2.4): same survivor set — rank 1 by id within a
    // sha group IS the group's min id — for ONE exchange instead of the
    // aggregate's narrow exchange plus the join's full-row one.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    val exactKept = gated
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Near-dup canonicalization over the exact-kept survivors: a doc in
    // a dup cluster survives only as the cluster's canonical (min id).
    val pairs = Dedup.nearDupMinhash(exactKept, idCol, textCol,
      threshold = threshold, maxDf = maxDf)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    exactKept.join(losers, Seq(idCol), "left_anti")
      .select(idCol, "n_tokens", "lang_pred")
  }
}
