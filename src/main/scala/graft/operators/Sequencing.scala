package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-free next-free-identifier assignment (SURVEY §2.6 W2).
  *
  * The reference probes the store one candidate at a time
  * (register-nanopore.py:70-79) or offsets a counter by what the batch
  * already used (register-omero.py:120-128). Distributed form: take
  * max(existing) per group in one aggregate, then `row_number()` over the
  * new rows per group — one shuffle, no driver loop, deterministic given a
  * total order on the new rows. Single-writer-per-group batch discipline
  * (the reference's own model) makes the sequence gap-free.
  */
object Sequencing {
  /** Assign `new_id` = max(existing num in group) + rank of the new row
    * within its group ordered by `orderBy`.
    *
    * @param existing (group, num) — already-used numbers
    * @param fresh    rows needing ids, containing `groupCol`
    */
  def nextIds(existing: DataFrame, fresh: DataFrame,
              groupCol: String, orderBy: Column): DataFrame = {
    // Collision-proof key name: a caller's groupCol named "group" must not
    // be dropped along with the join key.
    val maxes = existing.groupBy(col("group"))
      .agg(max(col("num")).as("__seq_max"))
      .withColumnRenamed("group", "__seq_group")
    val w = Window.partitionBy(col(groupCol)).orderBy(orderBy)
    fresh
      .join(maxes, fresh(groupCol) === maxes("__seq_group"), "left")
      .drop("__seq_group")
      .withColumn("new_id",
        coalesce(col("__seq_max"), lit(0L)) + row_number().over(w).cast("long"))
      .drop("__seq_max")
  }
}
