package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination at corpus scale.
  *
  * The exact shape (q_contam) joins training shingles against a
  * broadcast of the eval set's DISTINCT shingle hashes — right while
  * that set broadcasts comfortably. Real eval suites at 100 TB reach
  * hundreds of millions of shingles: an exact broadcast is gigabytes
  * per executor, while a Bloom filter at 1 % fpp is ~1.2 bytes per
  * element — a 10-100× smaller, CONSTANT-size broadcast.
  *
  * Error direction is the safe one for this job: Bloom filters have no
  * false negatives, so no contaminated document can score LOWER than
  * its exact overlap — the filter can only over-flag by ≤ fpp of the
  * clean shingles (DecontaminateSpec pins both properties against the
  * exact join). Probabilistic membership has no cross-engine oracle, so
  * this stays a spec-tested scale variant beside the oracle-gated exact
  * row — the same gate-config/deploy-config split as simhash32/64.
  */
object Decontaminate {
  /** Per-doc overlap of `train` (id, h) against the eval shingle set
    * (h), via a Bloom filter built distributed and broadcast once.
    * Returns (doc_id, n_sh, n_hit, overlap, contaminated). */
  def bloomOverlap(train: DataFrame, evalShingles: DataFrame,
                   threshold: Double, expectedItems: Long,
                   fpp: Double = 0.01): DataFrame = {
    val spark = train.sparkSession
    // distributed build (partition-local sketches OR-merged) — the eval
    // SET never lands on the driver, only the fixed-size bit array
    val bf = evalShingles.stat.bloomFilter("h", expectedItems, fpp)
    val bcast = spark.sparkContext.broadcast(bf)
    val hit = udf((h: Long) => bcast.value.mightContainLong(h))
    val ratio = round(col("n_hit").cast("double") / col("n_sh").cast("double"), 4)
    train
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(hit(col("h")), 1L).otherwise(0L)).as("n_hit"))
      .select(col("id").as("doc_id"), col("n_sh"), col("n_hit"),
        ratio.as("overlap"), (ratio >= threshold).as("contaminated"))
  }
}
