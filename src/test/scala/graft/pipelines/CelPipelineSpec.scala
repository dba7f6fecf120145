package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CelPipelineSpec extends SparkSpec {
  import spark.implicits._

  // The facility PDF's text layout (register-cel-dropbox.py:48-79):
  // order section, then a RIN section of barcode lines each followed by
  // a German-decimal value line. Doc 2 has no RIN section at all.
  private val pdf1 =
    """Kundeninformation
      |Auftragsnummer
      |I20241234
      |Mittwoch, 3. Januar 2024
      |RIN Nummer
      |QABCD001A0 Probe 1
      |7,6
      |QABCD002B4
      |8
      |ignored trailing text
      |""".stripMargin
  private val pdf2 = "no markers here\n123\nQZZZZ001A0"
  private val docs = Seq((1L, pdf1), (2L, pdf2)).toDF("pdf_id", "txt")

  test("rinAssociations pairs each barcode with its first following value") {
    val out = CelPipeline.rinAssociations(docs, "pdf_id", "txt")
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((1L, "QABCD001A0", 7.6), (1L, "QABCD002B4", 8.0)))
  }

  test("a numeric line before any barcode, or outside the RIN section, is ignored") {
    val tricky = Seq((1L,
      "5,5\nRIN Nummer\n6,6\nQABCD001A0\n7,7\n8,8")).toDF("pdf_id", "txt")
    // 5,5 precedes the section; 6,6 follows the marker but precedes any
    // barcode; 7,7 is the association; 8,8 is a second value (numFlag off).
    val out = CelPipeline.rinAssociations(tricky, "pdf_id", "txt")
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set((1L, "QABCD001A0", 7.7)))
  }

  test("orderNumbers picks the first I-line after Auftragsnummer") {
    val out = CelPipeline.orderNumbers(docs, "pdf_id", "txt")
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "I20241234")))
  }

  test("germanDecimal normalizes commas; malformed input nulls out") {
    val r = Seq("7,6", "8", "x,y").toDF("v")
      .select(CelPipeline.germanDecimal(col("v")).as("d"))
    assert(rows(r).flatten === Seq(7.6, 8.0, null))
  }
}
