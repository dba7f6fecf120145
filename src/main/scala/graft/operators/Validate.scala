package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-set validation guards (SURVEY §2.3 P7-P9).
  *
  * The reference raises on 0-found / many-found lookups
  * (etl_msconvert.py:376-383) and checks paired-end completeness by
  * counting mates per barcode (register-mtb-data-dropbox.py:241-248).
  * Distributed form: validations are themselves queries — error rows flow
  * out as DataFrames instead of aborting the job, so one bad group never
  * kills a 100 TB batch.
  */
object Validate {
  /** Groups whose row count is odd — incomplete read pairs (P9). */
  def unpairedGroups(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") % 2 =!= 0)

  /** Keys that violate a uniqueness expectation (P7 many-found). */
  def duplicatedKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Left rows with no match in `right` (P7 none-found), as error rows. */
  def missingRefs(left: DataFrame, right: DataFrame, joinExpr: Column): DataFrame =
    left.join(right, joinExpr, "left_anti")

  /** Assert the frame has all required columns (P8); returns the missing. */
  def missingColumns(df: DataFrame, required: Seq[String]): Seq[String] =
    required.filterNot(r => df.columns.exists(_.equalsIgnoreCase(r)))
}
