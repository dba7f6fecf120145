package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CentraXX document assembly (vcf2xml.py:240-401,
  * createGenevarsCxxCVs.py:96-160): panel-match semantics, the
  * deterministic cross-link, document structure, and catalog entry
  * ordering. The full byte-stream equivalence is gated by q_cxx. */
class CentraXXSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).getString(0)

  test("matchToPanel: VARIANTABSENT marker wins outright") {
    val df = Seq((Seq("V600E", "VARIANTABSENT"), Seq("V600E", "V600K")))
      .toDF("obs", "panel")
      .select(CentraXX.matchToPanel(col("obs"), col("panel")).as("r"))
    assert(df.collect()(0).getSeq[String](0) == Seq("VARIANTABSENT"))
  }

  test("matchToPanel: overlap sorted + VARIANTPRESENT appended") {
    val df = Seq((Seq("V600K", "V600E", "X999Y"), Seq("V600E", "V600K")))
      .toDF("obs", "panel")
      .select(CentraXX.matchToPanel(col("obs"), col("panel")).as("r"))
    assert(df.collect()(0).getSeq[String](0) ==
      Seq("V600E", "V600K", "VARIANTPRESENT"))
  }

  test("matchToPanel: on-panel gene with no overlap still marks presence") {
    val df = Seq((Seq("A1B"), Seq("V600E")))
      .toDF("obs", "panel")
      .select(CentraXX.matchToPanel(col("obs"), col("panel")).as("r"))
    assert(df.collect()(0).getSeq[String](0) == Seq("VARIANTPRESENT"))
  }

  test("matchToPanel: off-panel gene without marker is dropped (NULL)") {
    val df = Seq((Seq("A1B"), null: Seq[String]))
      .toDF("obs", "panel")
      .select(CentraXX.matchToPanel(col("obs"), col("panel")).as("r"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("crossLink is deterministic and sample-id-prefixed") {
    val a = one(CentraXX.crossLink(lit("QTEST001AE")))
    val b = one(CentraXX.crossLink(lit("QTEST001AE")))
    assert(a == b)
    assert(a.startsWith("QTEST001AE-") && a.length == "QTEST001AE-".length + 8)
    assert(one(CentraXX.crossLink(lit("QTEST002AE"))) != a)
  }

  test("patientExport carries ids, fixed refs, gene blocks in order") {
    val genes = array(
      struct(lit("BRAF").as("gene"),
        array(lit("V600E"), lit("VARIANTPRESENT")).as("refs")),
      struct(lit("TP53").as("gene"),
        array(lit("VARIANTABSENT")).as("refs")))
    val xml = one(CentraXX.patientExport(
      lit("QTEST-PAT-7"), lit("MPI7"), lit("QTEST007AE"), lit("PGM-7"),
      lit("2024-01-08T11:59:59"), lit("panelX"), genes))
    assert(xml.startsWith("<CentraXXDataExchange><Source>XMLIMPORT</Source>"))
    assert(xml.contains("<FlexibleID name=\"MPI\">MPI7</FlexibleID>"))
    assert(xml.contains("<FlexibleID name=\"QBIC_SAMPLE_ID\">QTEST007AE</FlexibleID>"))
    assert(xml.contains("<SampleTypeCatalogueTypeRef>UNKN</SampleTypeCatalogueTypeRef>"))
    assert(xml.contains("<Code>QBIC-GENEPANEL-V1-INSTANCE-QTEST007AE</Code>"))
    // the cross-link appears twice: sample ref + dataset instance ref
    val link = one(CentraXX.crossLink(lit("QTEST007AE")))
    assert(xml.sliding(link.length).count(_ == link) == 2)
    // BRAF block precedes TP53 block; refs render in array order
    val braf = xml.indexOf("QBIC-GENEPARAM-BRAF")
    val tp53 = xml.indexOf("QBIC-GENEPARAM-TP53")
    assert(braf >= 0 && tp53 > braf)
    assert(xml.contains(
      "<UserDefinedCatalogEntryRef>V600E</UserDefinedCatalogEntryRef>" +
        "<UserDefinedCatalogEntryRef>VARIANTPRESENT</UserDefinedCatalogEntryRef>"))
  }

  test("renderImportRequest: URL, basic auth, byte-true content length") {
    val req = one(CentraXX.renderImportRequest(lit("h.example"),
      lit("p_1.xml"), lit("u"), lit("pw"), lit("<a>ü</a>")))
    assert(req.startsWith("POST /centraxx/rest/import/queue/p_1.xml HTTP/1.1\r\n"))
    assert(req.contains("Authorization: Basic " +
      java.util.Base64.getEncoder.encodeToString("u:pw".getBytes("UTF-8")) + "\r\n"))
    assert(req.contains("Content-Type: application/xml\r\n"))
    // ü is 2 bytes in UTF-8: length must count bytes, not chars
    val body = "<a>ü</a>"
    assert(req.contains(s"Content-Length: ${body.getBytes("UTF-8").length}\r\n\r\n"))
    assert(req.endsWith("\r\n\r\n" + body))
  }

  test("renderStartRequest: empty-body trigger on the queue item") {
    val req = one(CentraXX.renderStartRequest(lit("h.example"),
      lit("p_1.xml"), lit("u"), lit("pw")))
    assert(req.startsWith("POST /centraxx/rest/import/queue/p_1.xml/start HTTP/1.1\r\n"))
    assert(req.endsWith("Content-Length: 0\r\n\r\n"))
  }

  test("geneCatalog: fixed presence entries first, de-then-en per entry") {
    val xml = one(CentraXX.geneCatalog(lit("KRAS"),
      array(lit("G12D"), lit("G13C"))))
    assert(xml.contains("<Code>QBIC-GENECV-KRAS</Code>"))
    // catalog header multilingual order is en, de (reference quirk) …
    assert(xml.contains(
      "<MultilingualEntry lang=\"en\">KRAS</MultilingualEntry>" +
        "<MultilingualEntry lang=\"de\">KRAS</MultilingualEntry>"))
    // … but each entry is de, en (createCustomCatalogEntry)
    assert(xml.contains(
      "<MultilingualEntry lang=\"de\">Variante(n) gefunden</MultilingualEntry>" +
        "<MultilingualEntry lang=\"en\">Variant(s) present</MultilingualEntry>"))
    val present = xml.indexOf("VARIANTPRESENT")
    val absent = xml.indexOf("VARIANTABSENT")
    val g12d = xml.indexOf("<Code>G12D</Code>")
    val g13c = xml.indexOf("<Code>G13C</Code>")
    assert(present >= 0 && absent > present && g12d > absent && g13c > g12d)
  }
}
