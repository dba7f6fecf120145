package graft.pipelines

import graft.core.Errors
import graft.functions.Barcode
import graft.sources.Parsers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attachment dropbox (register-attachment-dropbox.py): a `metadata.txt`
  * key=value sidecar (S5) names the target (`barcode=`/`user=`/`info=`),
  * attachment file names arrive URL-encoded (F7,
  * register-attachment-dropbox.py:94), and malformed metadata raises
  * typed errors (the reference's MetadataFormattingException family,
  * here per-row error codes).
  */
object AttachmentPipeline {
  /** Parse the sidecar into one metadata row: (barcode, user, info). */
  def readSidecar(spark: SparkSession, path: String): DataFrame =
    Parsers.readKeyValue(spark, path)
      .groupBy()
      .pivot("key", Seq("barcode", "user", "info"))
      .agg(first(col("value")))

  /** Validate + attach: URL-decode attachment names, join every
    * attachment to the sidecar's target barcode, error-tag rows whose
    * barcode is malformed or absent. */
  def attach(files: DataFrame, sidecar: DataFrame): DataFrame = {
    val tagged = files
      .withColumn("decoded_name", url_decode(col("name")))
      .crossJoin(sidecar)
    Errors.tag(
      Errors.tag(tagged, col("barcode").isNull, Errors.MetadataFormatting),
      col("barcode").isNotNull && !Barcode.isValid(col("barcode")),
      Errors.ChecksumMismatch)
  }
}
