package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-alignment operators (SURVEY §2.6 W1/W3, §2.4 J12).
  *
  * The reference pairs `sorted(xls)` with `sorted(vcf)` positionally
  * (register-iontorrent-data.py:371-372) and matches raw↔mzML files by
  * shared stem (register-raw-and-mzml.py). Distributed form: rank each
  * side with `row_number` and equi-join on the rank — one shuffle per
  * side, no driver sort.
  */
object Align {
  /** W1: positional pairing of two frames under their own sort orders.
    * Row i of `left` (by `leftOrder`) joins row i of `right` (by
    * `rightOrder`); unequal lengths keep only the common prefix. */
  def alignSorted(left: DataFrame, right: DataFrame,
                  leftOrder: Column, rightOrder: Column): DataFrame = {
    val l = left.withColumn("__rn",
      row_number().over(Window.orderBy(leftOrder)))
    val r = right.withColumn("__rn",
      row_number().over(Window.orderBy(rightOrder)))
    l.join(r, "__rn").drop("__rn")
  }

  /** J12: group files by stem (path minus final extension); `paths` is
    * the sorted member list, `complete` marks the expected pair size. */
  def pairByStem(files: DataFrame, pathCol: String,
                 expected: Int = 2): DataFrame =
    files.groupBy(
        regexp_replace(col(pathCol), "\\.[^./]+$", "").as("stem"))
      .agg(sort_array(collect_list(col(pathCol))).as("paths"),
        count(lit(1)).as("n"))
      .withColumn("complete", col("n") === expected)

  /** W3: latest row by a sortable column (most-recent variantCaller run,
    * register-iontorrent-data.py:237-242). */
  def latest(df: DataFrame, by: Column): DataFrame =
    df.orderBy(by.desc).limit(1)
}
