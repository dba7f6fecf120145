package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-row error channel (SURVEY §7 "error taxonomy").
  *
  * The reference aborts the whole transaction on the first bad row
  * (SampleNotFoundError / SampleAlreadyCreatedError, etl_msconvert.py:470-484;
  * MetadataFormattingException, register-attachment-dropbox.py:35-48).
  * At 100 TB one malformed row must not kill a batch: errors are data.
  * Each check appends to an `__errors` array column; `split` routes rows
  * to the ok/error channels at the end of a pipeline.
  */
object Errors {
  /** The reference's exception taxonomy as stable error codes. */
  val SampleNotFound = "SAMPLE_NOT_FOUND"
  val SampleAlreadyCreated = "SAMPLE_ALREADY_CREATED"
  val MetadataFormatting = "METADATA_FORMATTING"
  val ChecksumMismatch = "CHECKSUM_MISMATCH"
  val MissingPairedMate = "MISSING_PAIRED_MATE"
  val ExperimentNotFound = "EXPERIMENT_NOT_FOUND"
  val AmbiguousUpdate = "AMBIGUOUS_UPDATE"
  val ExperimentAlreadyCreated = "EXPERIMENT_ALREADY_CREATED"

  /** Ensure the error-channel column exists. */
  def withErrorChannel(df: DataFrame): DataFrame =
    if (df.columns.contains("__errors")) df
    else df.withColumn("__errors", array().cast("array<string>"))

  /** Append `code` to the error channel wherever `bad` holds. */
  def tag(df: DataFrame, bad: Column, code: String): DataFrame = {
    val d = withErrorChannel(df)
    d.withColumn("__errors",
      when(bad, array_append(col("__errors"), lit(code)))
        .otherwise(col("__errors")))
  }

  /** Route rows into (ok, errors): ok rows lose the channel column,
    * error rows keep their accumulated codes. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val d = withErrorChannel(df)
    (d.filter(size(col("__errors")) === 0).drop("__errors"),
      d.filter(size(col("__errors")) > 0))
  }
}
