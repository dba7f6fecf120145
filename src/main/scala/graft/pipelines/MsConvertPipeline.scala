package graft.pipelines

import graft.core.Errors
import graft.exec.External
import graft.functions.Barcode
import graft.operators.Align
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Mass-spec conversion dropbox (etl_msconvert.py) re-expressed:
  * raw↔mzML stem pairing (J12), idempotency probe for already-converted
  * files (X1's skip-if-done), and the conversion fan-out through the
  * exec harness with the reference's own dryrun seam.
  */
object MsConvertPipeline {
  /** Vendor-raw extensions the converter accepts (msconvert's input
    * formats; the reference routes on the same suffixes). */
  val RawExtensions: Seq[String] = Seq(".raw", ".d", ".wiff")

  /** Pair vendor-raw files with any existing converted sibling; raw
    * files whose pair is incomplete are conversion candidates. An orphan
    * .mzML (raw deleted or not yet uploaded) is NOT a candidate. */
  def conversionCandidates(files: DataFrame, pathCol: String = "path"): DataFrame =
    Align.pairByStem(files, pathCol)
      .filter(!col("complete"))
      .select(col("stem"), explode(col("paths")).as("raw_path"))
      .filter(RawExtensions
        .map(e => lower(col("raw_path")).endsWith(e)).reduce(_ || _))

  /** X1: run (or plan, with dryrun) the converter per candidate.
    * Partition-parallel; 7200 s timeout from the reference. */
  def convert(candidates: Dataset[String], dryrun: Boolean): Dataset[graft.exec.ExecResult] =
    External.execRows(candidates,
      raw => Seq("msconvert", raw, "--mzML", "--outdir", raw + ".out"),
      timeoutSec = 7200L, dryrun = dryrun)

  /** Barcode sanity over the incoming batch: >1 distinct barcode in one
    * file name is ambiguous (P1 disambiguation guard). */
  def tagAmbiguous(files: DataFrame, pathCol: String = "path"): DataFrame =
    Errors.tag(files, Barcode.distinctMatches(col(pathCol)) > 1,
      Errors.MetadataFormatting)
}
