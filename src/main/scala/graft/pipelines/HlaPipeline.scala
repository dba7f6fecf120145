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
    hlaSamplesWithPath(scan)
      .select("sample_code", "parent", "hla_class", "typing")

  private def hlaSamplesWithPath(scan: DataFrame): DataFrame =
    alleleFiles(scan)
      .withColumn("parent", Barcode.extract(col("path")))
      .withColumn("hla_class", mhcClass(col("typing")))
      .withColumn("sample_code",
        concat(lit("HLA"), mhcSuffix(col("typing")), col("parent")))

  /** The dropbox flow: derive sample rows from the scan and MERGE them
    * into the existing HLA sample table (same schema), new samples
    * created, existing ones re-typed (:119-128).
    *
    * One batch CAN carry two result files for the same parent (a
    * re-upload of `X.alleles` plus `X/alleles.txt`): the reference's
    * sequential loop keeps whichever its directory walk served last —
    * an ORDER the distributed MERGE doesn't have. The winner is pinned
    * deterministically instead (lexicographically greatest source path
    * per sample_code), so the batch stays key-unique and a rerun can't
    * flap; [[Catalog.upsert]]'s uniqueness guard backstops the
    * invariant loudly if this reduction is ever bypassed. */
  def register(existing: DataFrame, scan: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sample_code")).orderBy(col("path").desc)
    val incoming = hlaSamplesWithPath(scan)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("sample_code", "parent", "hla_class", "typing")
    Catalog.upsert(existing, incoming, Seq("sample_code"))
  }
}
