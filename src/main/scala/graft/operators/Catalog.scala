package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Catalog-table maintenance (SURVEY §2.2 K1/K2): MERGE-style upsert and
  * append-with-dedup, the distributed form of the reference's
  * `getSampleForUpdate` / `createNewSample` mutations
  * (register-hlatyping.py:119-128 et al.).
  *
  * Semantics: last-wins per key — incoming rows replace existing rows with
  * the same key; unmatched existing rows survive. One shuffle on the key
  * set (the window), no driver round-trips. At scale, write the result
  * partitioned by the key's bucket so successive upserts co-locate.
  */
object Catalog {
  /** MERGE (upsert): `incoming` wins over `existing` on `keys`. Both
    * frames must share a schema.
    *
    * Duplicate keys WITHIN one incoming batch have no inherent order in a
    * distributed frame, so "last wins" is undefined for them: pass
    * `tieBreak` columns (highest wins, e.g. an event timestamp) to make
    * the winner deterministic, or leave it empty to ASSERT the
    * uniqueness precondition — a batch with a repeated incoming key then
    * fails loudly at execution (reference semantics are a sequential
    * last-write, register-mtb-data-dropbox.py:401-404; silently picking
    * an arbitrary row would make reruns flap). The guard rides the same
    * window shuffle — no extra job either way. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             tieBreak: Seq[String] = Nil): DataFrame = {
    val tagged = existing.withColumn("__prio", lit(0))
      .unionByName(incoming.withColumn("__prio", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__prio").desc +: tieBreak.map(col(_).desc): _*)
    val picked = tagged.withColumn("__rn", row_number().over(w))
    val kept =
      if (tieBreak.nonEmpty) picked.filter(col("__rn") === 1)
      else {
        // uniqueness assertion fused into the pick FILTER — an unused
        // guard column would be pruned away, silencing the error, and a
        // window function can't sit in a WHERE clause, so the count is
        // materialized as a column of the same window shuffle first
        picked
          .withColumn("__nin", sum(col("__prio"))
            .over(Window.partitionBy(keys.map(col): _*)))
          .filter(
            when(col("__nin") > 1, raise_error(concat(
              lit("Catalog.upsert: duplicate incoming rows for key ("),
              concat_ws(",", keys.map(col): _*),
              lit(") — pass tieBreak columns to define the winner")))
              .cast("boolean"))
            .otherwise(col("__rn") === 1))
          .drop("__nin")
      }
    kept.drop("__prio", "__rn")
  }

  /** K1-style idempotent append: add only incoming rows whose key is not
    * already present (re-submission attaches nothing twice — the
    * reference's duplicate-dataset drop, register-mtb-data-dropbox.py:401-404). */
  def appendNew(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing.select(keys.map(col): _*).distinct(),
        keys, "left_anti"))
}
