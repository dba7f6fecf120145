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

  /** Type-2 slowly-changing dimension apply: [[upsert]] keeps only the
    * latest row per key; this keeps the HISTORY — a changed key closes
    * its open row (`valid_to` = batchTs) and opens a new one, an
    * unchanged or untouched key keeps its open row, a new key opens its
    * first. `hist` carries (keys, attrs, valid_from, valid_to NULL =
    * open); `incoming` carries (keys, attrs), at most one row per key.
    *
    * Change detection reuses [[Snapshot.rowFingerprint]] over the attr
    * columns (width-independent compare), and the whole apply is ONE
    * full-outer join of open rows vs incoming plus an explode of
    * per-case row arrays — already-closed history is untouched and
    * unioned back verbatim. At scale, bucket the history by key so
    * successive applies co-locate. */
  def scd2Apply(hist: DataFrame, incoming: DataFrame, keys: Seq[String],
                batchTs: Long): DataFrame = {
    val attrs = incoming.columns.filterNot(keys.contains).toSeq
    require(attrs.nonEmpty, "incoming must carry at least one attr column")
    val closed = hist.filter(col("valid_to").isNotNull)
    val open = hist.filter(col("valid_to").isNull)
      .withColumn("__fp", Snapshot.rowFingerprint(attrs.map(col)))
    val inc = incoming
      .withColumn("__fp_n", Snapshot.rowFingerprint(attrs.map(col)))
      .select(keys.map(col) ++ attrs.map(c => col(c).as(s"__n_$c")) :+
        col("__fp_n"): _*)
    val outCols = keys ++ attrs ++ Seq("valid_from", "valid_to")
    def mk(attr: String => org.apache.spark.sql.Column,
           from: org.apache.spark.sql.Column,
           to: org.apache.spark.sql.Column) =
      struct(keys.map(col) ++ attrs.map(c => attr(c).as(c)) :+
        from.as("valid_from") :+ to.as("valid_to"): _*)
    val nullTs = lit(null).cast("long")
    val keepOpen = mk(col, col("valid_from"), nullTs)
    val closeOld = mk(col, col("valid_from"), lit(batchTs))
    val openNew = mk(c => col(s"__n_$c"), lit(batchTs), nullTs)
    val applied = open.join(inc, keys, "full_outer")
      .select(explode(
        when(col("__fp_n").isNull, array(keepOpen)) // key untouched
          .when(col("__fp").isNull, array(openNew)) // brand-new key
          .when(col("__fp") === col("__fp_n"), array(keepOpen)) // same value
          .otherwise(array(closeOld, openNew))).as("r")) // changed
      .select(outCols.map(c => col(s"r.$c").as(c)): _*)
    closed.select(outCols.map(col): _*).unionByName(applied)
  }
}
