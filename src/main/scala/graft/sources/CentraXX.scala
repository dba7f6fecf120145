package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CentraXX full-document XML export (SURVEY §2 K8's deepest instance).
  *
  * The reference assembles a complete patient/sample/variant exchange
  * document with PyXB DOM bindings (vcf2xml.py:240-401
  * `createPatientExport`) plus per-gene controlled-vocabulary catalogs
  * (createGenevarsCxxCVs.py:96-160
  * `writeGenePanelControlledVocabularies`). This is the declarative
  * re-expression: each document is ONE string column built from
  * `concat`/`transform`/`array_join` over a per-row gene array — pure
  * whole-stage-codegen expressions, no DOM objects, no driver loop, so a
  * billion-row export renders scan-stage and writes straight to any sink.
  *
  * Deliberate divergences from the PyXB original, both for replayability
  * (same policy as [[Sinks.renderInquiryMail]]'s fixed boundary):
  *  - the sample↔dataset cross-link id is DETERMINISTIC
  *    (`<qSampleId>-<sha256 prefix>`), not `uuid.uuid4()` — a random id
  *    breaks exactly-once sinks and makes replay tests impossible;
  *  - output is canonical single-line XML, not `toprettyxml` — stable
  *    bytes for hashing/dedup of rendered documents;
  *  - per-gene blocks and catalog-entry refs are emitted in sorted order
  *    (the reference iterates Python dict/set order, which is
  *    unspecified in Jython 2.5).
  */
object CentraXX {

  private def esc(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), "\"", "&quot;")

  private def el(tag: String, body: Column): Column =
    concat(lit(s"<$tag>"), body, lit(s"</$tag>"))

  private def dateBlock(tag: String, isoDate: Column): Column =
    el(tag, concat(el("Date", isoDate), el("Precision", lit("EXACT"))))

  /** Deterministic replacement for the reference's
    * `qSampleID + '-' + uuid4()` cross-link (vcf2xml.py:323). */
  def crossLink(qSampleId: Column): Column =
    concat(qSampleId, lit("-"), substring(sha2(qSampleId.cast("binary"), 256), 1, 8))

  /** One `<FlexibleEnumerationValue>` block per gene
    * (vcf2xml.py:355-368): the gene's value-type ref plus one
    * `UserDefinedCatalogEntryRef` per matched variant / presence marker.
    * `genes` is `array<struct<gene:string, refs:array<string>>>`,
    * pre-sorted by gene. */
  private def geneBlocks(genes: Column): Column =
    array_join(transform(genes, g =>
      concat(
        lit("<FlexibleEnumerationValue><FlexibleValueTypeRef>QBIC-GENEPARAM-"),
        g.getField("gene"),
        lit("</FlexibleValueTypeRef>"),
        array_join(transform(g.getField("refs"), v =>
          el("UserDefinedCatalogEntryRef", v)), ""),
        lit("</FlexibleEnumerationValue>"))), "")

  /** The full patient export document (vcf2xml.py:240-401): patient ID
    * container (MPI + QBiC id), master-sample block with the reference's
    * fixed catalogue refs, and the QBIC-GENEPANEL-V1 flexible-dataset
    * instance carrying the per-gene variant enumeration. */
  def patientExport(qPatientId: Column, mpi: Column, qSampleId: Column,
                    pgmSampleId: Column, samplingDate: Column,
                    panelName: Column, genes: Column): Column = {
    val link = crossLink(qSampleId)
    val masterSample = el("MasterSample", concat(
      el("Source", lit("XMLIMPORT")),
      el("SampleIDContainer", concat(
        concat(lit("<FlexibleID name=\"SAMPLEID\">"), pgmSampleId, lit("</FlexibleID>")),
        concat(lit("<FlexibleID name=\"QBIC_SAMPLE_ID\">"), qSampleId, lit("</FlexibleID>")))),
      el("SampleTypeCatalogueTypeRef", lit("UNKN")),
      el("OrganisationUnitTypeRef", lit("QBIC")),
      el("SampleReceptacleTypeRef", lit("KRYO")),
      el("HasChildren", lit("false")),
      lit("<AmountRest unit=\"PC\">1.0</AmountRest>"),
      lit("<InitialAmount unit=\"PC\">1.0</InitialAmount>"),
      el("SampleKind", lit("TISSUE")),
      el("SampleLocationRef", lit("QBIC_STORAGE")),
      el("UseSPREC", lit("false")),
      el("VirtualPatient", lit("false")),
      el("XPosition", lit("0")),
      el("YPosition", lit("0")),
      dateBlock("SamplingDate", samplingDate),
      dateBlock("RepositionDate", samplingDate),
      dateBlock("FirstRepositionDate", samplingDate),
      el("SopDeviation", lit("false")),
      el("FlexibleDataSetRef", link)))
    val patientDataSet = el("PatientDataSet", concat(
      el("Source", lit("XMLIMPORT")),
      el("IDContainer", concat(
        concat(lit("<FlexibleID name=\"MPI\">"), mpi, lit("</FlexibleID>")),
        concat(lit("<FlexibleID name=\"QBIC_PAT_ID\">"), qPatientId, lit("</FlexibleID>")))),
      lit("<Masterdata/>"),
      el("OrganisationUnitRefs", lit("QBIC")),
      el("SampleData", masterSample)))
    val flexInstance = el("FlexibleDataSetInstance", concat(
      el("FlexibleDataSetTypeRef", lit("QBIC-GENEPANEL-V1")),
      el("InstanceName", esc(panelName)),
      dateBlock("Date", samplingDate),
      el("Code", concat(lit("QBIC-GENEPANEL-V1-INSTANCE-"), qSampleId)),
      el("FlexibleDataSetInstanceRef", link),
      geneBlocks(genes)))
    el("CentraXXDataExchange", concat(
      el("Source", lit("XMLIMPORT")),
      el("EffectData", concat(patientDataSet, flexInstance))))
  }

  private def multilingual(lang: String, value: Column): Column =
    concat(lit(s"""<MultilingualEntry lang="$lang">"""), esc(value),
      lit("</MultilingualEntry>"))

  /** One `<CustomCatalogEntry>` (createGenevarsCxxCVs.py:96-104) —
    * NB the reference appends [de, en] here but [en, de] on the catalog
    * header; both orders kept faithfully. */
  private def catalogEntry(code: Column, en: Column, de: Column): Column =
    el("CustomCatalogEntry", concat(
      el("Code", code),
      el("NameMultilingualEntries",
        concat(multilingual("de", de), multilingual("en", en)))))

  /** The per-gene controlled-vocabulary catalog document
    * (createGenevarsCxxCVs.py:107-160): the gene's custom catalog with
    * the two fixed presence markers followed by one entry per allowed
    * variant. `variants` is `array<string>`, pre-sorted. */
  def geneCatalog(gene: Column, variants: Column): Column = {
    val entries = concat(
      catalogEntry(lit("VARIANTPRESENT"),
        lit("Variant(s) present"), lit("Variante(n) gefunden")),
      catalogEntry(lit("VARIANTABSENT"),
        lit("No variants present"), lit("Keine Varianten gefunden")),
      array_join(transform(variants, v => catalogEntry(v, v, v)), ""))
    el("CentraXXDataExchange", concat(
      el("Source", lit("QBiC")),
      el("CatalogueData", el("CustomCatalog", concat(
        el("Code", concat(lit("QBIC-GENECV-"), gene)),
        el("NameMultilingualEntries",
          concat(multilingual("en", gene), multilingual("de", gene))),
        el("CatalogUsage", lit("GENERAL")),
        el("Version", lit("1")),
        el("EntityStatus", lit("ACTIVE")),
        entries)))))
  }

  /** K5's ENGINE half: the CentraXX REST import-queue push
    * (pushXML2cxxRest.py:44-54) rendered as a deterministic RFC-7230
    * request string — POST of the XML body to
    * `/centraxx/rest/import/queue/<filename>` with Basic auth and
    * `Content-Type: application/xml`. Transport stays the exec /
    * foreachPartition seam, the same engine/transport division as
    * [[Sinks.renderInquiryMail]] (K4): what the reference computes —
    * URL shape, auth material, headers, body — is engine-side and
    * gate-checkable; the socket is not. Content-Length is true BYTES
    * (octet_length), not chars. */
  def renderImportRequest(host: Column, filename: Column, user: Column,
                          password: Column, xml: Column): Column =
    concat(
      lit("POST /centraxx/rest/import/queue/"), filename, lit(" HTTP/1.1\r\n"),
      lit("Host: "), host, lit("\r\n"),
      lit("Authorization: Basic "),
      base64(concat(user, lit(":"), password).cast("binary")), lit("\r\n"),
      lit("Content-Type: application/xml\r\n"),
      lit("Content-Length: "), octet_length(xml).cast("string"),
      lit("\r\n\r\n"), xml)

  /** The import trigger (pushXML2cxxRest.py:66-75): empty-body POST to
    * `<queue item>/start`. */
  def renderStartRequest(host: Column, filename: Column, user: Column,
                         password: Column): Column =
    concat(
      lit("POST /centraxx/rest/import/queue/"), filename,
      lit("/start HTTP/1.1\r\n"),
      lit("Host: "), host, lit("\r\n"),
      lit("Authorization: Basic "),
      base64(concat(user, lit(":"), password).cast("binary")), lit("\r\n"),
      lit("Content-Length: 0\r\n\r\n"))

  /** The reference's panel-match (vcf2xml.py:179-197
    * `matchVariantsToQBiCPanel`) as array expressions over a per-gene
    * row: an observed VARIANTABSENT marker wins outright; a panel gene
    * exports the (sorted) observed∩panel overlap plus the
    * VARIANTPRESENT marker; an off-panel gene without the marker
    * exports nothing (NULL → caller filters). `observed` and
    * `panelVars` are `array<string>`; `panelVars` NULL = gene not on
    * the panel. */
  def matchToPanel(observed: Column, panelVars: Column): Column =
    when(array_contains(observed, "VARIANTABSENT"), array(lit("VARIANTABSENT")))
      .when(panelVars.isNotNull,
        concat(array_sort(array_intersect(observed, panelVars)),
          array(lit("VARIANTPRESENT"))))
      .otherwise(lit(null))
}
