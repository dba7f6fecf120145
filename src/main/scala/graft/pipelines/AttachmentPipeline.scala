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

  /** Batched form: sidecars from MANY upload folders at once (glob),
    * one pivoted row per folder — the folder path is the transaction
    * key a multi-upload ingest joins its attachments on. */
  def readSidecars(spark: SparkSession, glob: String): DataFrame =
    Parsers.readKeyValue(spark, glob)
      .withColumn("folder", regexp_replace(input_file_name(), "/[^/]*$", ""))
      .groupBy("folder")
      .pivot("key", Seq("barcode", "user", "info"))
      .agg(first(col("value")))

  /** Validate + attach: URL-decode attachment names, join every
    * attachment to its sidecar's target barcode, error-tag rows whose
    * barcode is malformed or absent.
    *
    * With `key` (e.g. `Seq("folder")`) each attachment joins ONLY its
    * own transaction's sidecar — the batched multi-upload form. Without
    * a key this is the reference's one-transaction-one-sidecar model
    * (register-attachment-dropbox.py processes a single folder), and the
    * single-row sidecar is ENFORCED: silently crossing every file with
    * every sidecar row would misattach payloads in a batched ingest. */
  def attach(files: DataFrame, sidecar: DataFrame,
             key: Seq[String] = Nil): DataFrame = {
    val decoded = files.withColumn("decoded_name", url_decode(col("name")))
    val tagged =
      if (key.nonEmpty) decoded.join(broadcast(sidecar), key, "left")
      else {
        // Pin the pivoted sidecar before counting: the ==1 guard and the
        // crossJoin below would otherwise each recompute the pivot (two
        // jobs over the sidecar scan). One cached row is free to keep.
        val pinned = sidecar.persist()
        require(pinned.count() == 1L,
          "one-transaction attach expects exactly ONE sidecar row; " +
            "a batched multi-upload ingest must pass the folder/transaction key")
        decoded.crossJoin(broadcast(pinned))
      }
    Errors.tag(
      Errors.tag(tagged, col("barcode").isNull, Errors.MetadataFormatting),
      col("barcode").isNotNull && !Barcode.isValid(col("barcode")),
      Errors.ChecksumMismatch)
  }
}
