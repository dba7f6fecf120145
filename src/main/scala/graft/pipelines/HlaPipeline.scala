package graft.pipelines

import graft.functions.Barcode
import graft.operators.Catalog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HLA-typing registration (register-hlatyping-dropbox/register-hlatyping.py:95-135).
  *
  * The reference opens the `.alleles` / `alleles.txt` result file, stores
  * its WHOLE content as the `Q_HLA_TYPING` property value, routes the
  * sample by content (`'A*' in text` → MHC class I, else II), and
  * upserts `HLA<suffix><parentBarcode>` into the store — creating it
  * with `Q_HLA_CLASS` when absent, always refreshing the typing text.
  *
  * Spark form: the dropbox scan is a `binaryFile` frame, the whole-file
  * payload→property step is one `cast(content as string)` projection
  * (no driver reads), routing is a column expression, and the
  * create-or-update is [[Catalog.upsert]] — same MERGE the reference
  * performs one sample at a time, for every upload in the batch at once.
  */
object HlaPipeline {
  /** Result-file routing: `.alleles` or `alleles.txt` (:100-105). */
  def alleleFiles(scan: DataFrame): DataFrame =
    scan.filter(col("path").endsWith(".alleles") ||
        col("path").endsWith("alleles.txt"))
      .withColumn("typing", col("content").cast("string"))

  /** MHC-class routing by file content (:111-117). */
  def mhcClass(typing: Column): Column =
    when(typing.contains("A*"), "MHC_CLASS_I").otherwise("MHC_CLASS_II")

  private def mhcSuffix(typing: Column): Column =
    when(typing.contains("A*"), "1").otherwise("2")

  /** One HLA sample row per allele file: code = HLA + suffix + parent
    * barcode (extracted from the path), whole-file typing payload. */
  def hlaSamples(scan: DataFrame): DataFrame =
    alleleFiles(scan)
      .withColumn("parent", Barcode.extract(col("path")))
      .withColumn("hla_class", mhcClass(col("typing")))
      .withColumn("sample_code",
        concat(lit("HLA"), mhcSuffix(col("typing")), col("parent")))
      .select("sample_code", "parent", "hla_class", "typing")

  /** The dropbox flow: derive sample rows from the scan and MERGE them
    * into the existing HLA sample table (same schema), new samples
    * created, existing ones re-typed (:119-128). */
  def register(existing: DataFrame, scan: DataFrame): DataFrame =
    Catalog.upsert(existing, hlaSamples(scan), Seq("sample_code"))
}
