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
    * frames must share a schema. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = existing.withColumn("__prio", lit(0))
      .unionByName(incoming.withColumn("__prio", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__prio").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__prio", "__rn")
  }

  /** K1-style idempotent append: add only incoming rows whose key is not
    * already present (re-submission attaches nothing twice — the
    * reference's duplicate-dataset drop, register-mtb-data-dropbox.py:401-404). */
  def appendNew(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing.select(keys.map(col): _*).distinct(),
        keys, "left_anti"))
}
