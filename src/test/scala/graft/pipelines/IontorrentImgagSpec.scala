package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-fixture composition specs for the last two uncovered reference
  * assemblies: the iontorrent variant TSV export (K8 + J3) and the IMGAG
  * nested-scan parent merge collapsed into equi-joins (§4). */
class IontorrentExportSpec extends SparkSpec {
  import spark.implicits._

  test("detected variants + VARIANTABSENT rows, exported as one named TSV") {
    val significant = Seq(("BRCA1", "p.V600E"), ("TP53", "p.R175H"))
      .toDF("gene", "aa_change")
    val analyzed = Seq("BRCA1", "TP53", "EGFR", "KRAS").toDF("gene")
    val rowsOut = IontorrentPipeline.variantExportRows(significant, analyzed)
    assert(rows(rowsOut.orderBy("gene", "change")) === Seq(
      Seq("BRCA1", "p.V600E"), Seq("EGFR", "VARIANTABSENT"),
      Seq("KRAS", "VARIANTABSENT"), Seq("TP53", "p.R175H")))

    val dir = java.nio.file.Files.createTempDirectory("graft-cxx").toString
    val path = IontorrentPipeline.export(significant, analyzed, dir,
      patientId = "P123", sampleId = "NGS456")
    assert(path.endsWith("P123-NGS456-variants.tsv"))
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray.map(_.toString).toSet
    // Headerless two-column lines, exactly the reference's format (:509-516).
    assert(lines === Set("BRCA1\tp.V600E", "TP53\tp.R175H",
      "EGFR\tVARIANTABSENT", "KRAS\tVARIANTABSENT"))
  }
}

class ImgagMergeSpec extends SparkSpec {
  import spark.implicits._

  private val space = "IVAC"
  private def samples = Seq(
    // direct-code hit: the request barcode IS a test sample (:159 lhs)
    ("QABCD001A0", "/IVAC/QABCD001A0", "Q_TEST_SAMPLE", "DNA", null, null),
    // parent-edge hit: child of /IVAC/QABCD002AX with the short id (:159 rhs)
    ("QTEST1", "/IVAC/QTEST1", "Q_TEST_SAMPLE", "DNA", "GS2 tumor dna", null),
    // run samples attached to each resolved test sample (:168)
    ("NGS1", "/IVAC/NGS1", "Q_NGS_SINGLE_SAMPLE_RUN", "DNA", "GS1_01 run", null),
    ("NGS2", "/IVAC/NGS2", "Q_NGS_SINGLE_SAMPLE_RUN", "DNA", null, "GS2_01")
  ).toDF("code", "identifier", "sample_type", "analyte", "sec_name", "ext_id")

  private def edges = Seq(
    ("/IVAC/QTEST1", "/IVAC/QABCD002AX"),
    ("/IVAC/NGS1", "/IVAC/QABCD001A0"),
    ("/IVAC/NGS2", "/IVAC/QTEST1")
  ).toDF("child_identifier", "parent_identifier")

  test("both predicate shapes resolve to their run parents via equi-joins") {
    val requests = Seq(("QABCD001A0", "GS1_01"), ("QABCD002AX", "GS2_01"))
      .toDF("barcode", "genetic_id")
    val resolved = ImgagPipeline.resolveParents(requests, samples, edges, space)
    assert(rows(resolved.orderBy("genetic_id")) === Seq(
      Seq("QABCD001A0", "GS1_01", "/IVAC/QABCD001A0", "/IVAC/NGS1"),
      Seq("QABCD002AX", "GS2_01", "/IVAC/QTEST1", "/IVAC/NGS2")))
    // The reference's O(n²) scan must NOT come back as a nested-loop plan.
    val plan = resolved.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("completeness guard surfaces unresolvable requests (:220)") {
    val requests = Seq(("QABCD001A0", "GS1_01"), ("QZZZZ999Z9", "GS9_01"))
      .toDF("barcode", "genetic_id")
    val resolved = ImgagPipeline.resolveParents(requests, samples, edges, space)
    val missing = ImgagPipeline.unresolved(requests, resolved)
    assert(rows(missing.select("genetic_id")).flatten === Seq("GS9_01"))
  }
}
