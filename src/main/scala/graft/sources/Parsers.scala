package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sidecar-metadata and bioinformatics file readers (SURVEY §2.1 S3-S9).
  *
  * Every reader is declarative — `spark.read` + column expressions — so
  * Catalyst prunes/pushes into the scan and the parse stays inside
  * whole-stage codegen. Nothing here collects to the driver: a 100 TB
  * directory of VCFs parses exactly like one file.
  */
object Parsers {

  /** S3: TSV-with-header reader (reference `metadata.tsv` /
    * `metadata_table.tsv`, etl_msconvert.py:591-600, register-omero.py:181-236). */
  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true").csv(path)

  /** S4: JSON metadata reader (register-imgag.py:48-53
    * `parse_metadata_file` — one whole-file JSON document per upload). */
  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S5: key=value sidecar reader (`metadata.txt` with `user=`, `info=`,
    * `barcode=` lines, register-attachment-dropbox.py:62-84). Lines
    * without '=' are dropped; value keeps any embedded '='. */
  def readKeyValue(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(col("value").contains("="))
      .select(
        regexp_extract(col("value"), "^([^=]*)=", 1).as("key"),
        regexp_replace(col("value"), "^[^=]*=", "").as("value"))

  /** The snpEff `ANN=` subfield names, in order (public snpEff/VCF
    * annotation spec; consumed by the reference at extractPGMdata.py:126-147). */
  val AnnFields: Seq[String] = Seq(
    "allele", "annotation", "impact", "gene", "gene_id", "feature_type",
    "feature_id", "transcript_biotype", "rank", "hgvs_c", "hgvs_p",
    "cdna_pos", "cds_pos", "aa_pos", "distance", "errors")

  private def annStruct(a: Column): Column = {
    val f = split(a, "\\|")
    // get(), not apply: truncated ANN entries yield null fields instead
    // of an ANSI array-index error (same policy as the fixed columns).
    struct(AnnFields.zipWithIndex.map { case (n, i) => get(f, lit(i)).as(n) }: _*)
  }

  /** S6 parse stage, over any `value: string` line frame — skips `#`
    * headers, splits the 8 fixed columns, parses INFO into a map and
    * `ANN=` into an array of annotation structs (extractPGMdata.py:53-95
    * `extractVCFdata` semantics). Separated from the file read so
    * queries can drive the parser on rendered lines. */
  def parseVcfLines(lines: DataFrame): DataFrame = {
    val fixed = Seq("chrom", "pos", "id", "ref", "alt", "qual", "filter", "info")
    lines
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      .select(split(col("value"), "\t").as("f"))
      // `get` (not apply): ragged lines yield nulls instead of an ANSI
      // array-index error deep inside a 100 TB scan.
      .select(fixed.zipWithIndex.map { case (n, i) => get(col("f"), lit(i)).as(n) }: _*)
      // try_cast, same policy as `get` above: a malformed POS yields null,
      // never an ANSI abort mid-scan (also keeps constant folding from
      // throwing on not-yet-filtered header literals).
      .withColumn("pos", col("pos").try_cast("long"))
      .withColumn("info_map", str_to_map(col("info"), lit(";"), lit("=")))
      .withColumn("ann",
        when(col("info_map")("ANN").isNull, array().cast("array<string>"))
          .otherwise(split(col("info_map")("ANN"), ",")))
      .withColumn("ann", transform(col("ann"), annStruct(_)))
  }

  /** S6: VCF reader (file form of [[parseVcfLines]]). */
  def readVcf(spark: SparkSession, path: String): DataFrame =
    parseVcfLines(spark.read.text(path))

  /** S7 parse stage over a `value: string` line frame — `##key=value`
    * pragma lines as rows (register-iontorrent-data.py:164-184 greps
    * `##parametersName=` / `##fileUTCtime=`). */
  def parsePragmaLines(lines: DataFrame): DataFrame =
    lines
      .filter(col("value").startsWith("##"))
      .select(
        regexp_extract(col("value"), "^##([^=]+)=", 1).as("key"),
        regexp_replace(col("value"), "^##[^=]+=", "").as("value"))
      .filter(length(col("key")) > 0)

  /** S7: VCF header-pragma probe (file form of [[parsePragmaLines]]). */
  def vcfPragmas(spark: SparkSession, path: String): DataFrame =
    parsePragmaLines(spark.read.text(path))

  /** S9 parse stage over a `value: string` line frame — `"<hex> *<relpath>"`
    * (register-nanopore.py:200-207 `fillChecksumMap`). */
  def parseChecksumLines(lines: DataFrame): DataFrame =
    lines.select(
        regexp_extract(col("value"), "^([0-9a-fA-F]{64})\\s+\\*?(.*)$", 1).as("sha256"),
        regexp_extract(col("value"), "^([0-9a-fA-F]{64})\\s+\\*?(.*)$", 2).as("relpath"))
      .filter(length(col("sha256")) > 0)

  /** S9: sha256sum manifest reader (file form of [[parseChecksumLines]]). */
  def readChecksumManifest(spark: SparkSession, path: String): DataFrame =
    parseChecksumLines(spark.read.text(path))

  /** S8 probe stage over a `value: string` line frame — first-match
    * field probes (W4 limit semantics). NOTE: `limit(1)` over a
    * multi-partition frame picks an engine-arbitrary match when several
    * lines match; mzML headers carry each probed attribute once, which
    * is what makes the reference's first-match read well-defined. */
  def probeLines(lines: DataFrame, fields: Seq[(String, String)]): DataFrame =
    fields.map { case (key, rx) =>
      lines.select(regexp_extract(col("value"), rx, 1).as("value"))
        .filter(length(col("value")) > 0)
        .limit(1)
        .select(lit(key).as("key"), col("value"))
    }.reduce(_ unionByName _)

  /** S8: mzML stream probe — first run `startTimeStamp` and first
    * instrument cvParam accession WITHOUT parsing the XML document
    * (etl_msconvert.py:237-280 line-scan + iterparse probe). Returns
    * (key, value) rows; absent keys yield no row. */
  def mzmlProbe(spark: SparkSession, path: String): DataFrame =
    probeLines(spark.read.text(path), Seq(
      "startTimeStamp" -> "startTimeStamp=\"([^\"]+)\"",
      "instrumentAccession" -> "cvParam[^>]*accession=\"(MS:[0-9]+)\""))

  /** S10 (downstream shape): labeled line-scan over extracted text —
    * regex field extraction per line, one row per (label, match)
    * (register-cel-dropbox.py:49-81 state-machine analog, declarative). */
  def lineScan(text: DataFrame, textCol: String,
               fields: Map[String, String]): DataFrame = {
    val lines = text
      .select(posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
    fields.toSeq.sortBy(_._1).map { case (label, rx) =>
      lines.select(lit(label).as("label"), col("line_no"),
          regexp_extract(col("line"), rx, 1).as("value"))
        .filter(length(col("value")) > 0)
    }.reduce(_ unionByName _)
  }
}
