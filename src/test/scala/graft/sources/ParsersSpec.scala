package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParsersSpec extends SparkSpec {
  import spark.implicits._

  test("TSV reader: header + tab separation") {
    val df = Parsers.readTsv(spark, fixture("metadata.tsv"))
    assert(df.columns.toSeq === Seq("Filename", "Barcode", "Group"))
    assert(df.count() === 2)
    assert(rows(df.filter(col("Filename") === "file1.raw").select("Barcode"))
      .flatten === Seq("QABCD001A0"))
  }

  test("key=value reader: splits on first '=', keeps embedded '='") {
    val df = Parsers.readKeyValue(spark, fixture("metadata.txt"))
    val m = df.as[(String, String)].collect().toMap
    assert(m === Map("user" -> "alice", "info" -> "desc = with equals",
      "barcode" -> "QABCD001A0"))
  }

  test("VCF reader: fixed columns, INFO map, ANN structs") {
    val df = Parsers.readVcf(spark, fixture("sample.vcf"))
    assert(df.count() === 2)
    val r1 = df.filter(col("chrom") === "chr1")
    assert(rows(r1.select("pos", "ref", "alt")) === Seq(Seq(1234L, "A", "T")))
    assert(rows(r1.select(col("info_map")("AF"))).flatten === Seq("0.12"))
    val ann = r1.select(explode(col("ann")).as("a")).select("a.allele", "a.gene", "a.hgvs_p")
    assert(rows(ann) === Seq(Seq("T", "BRAF", "p.Lys41Asn")))
    // no-ANN row parses to an empty annotation array
    assert(rows(df.filter(col("chrom") === "chr2").select(size(col("ann"))))
      .flatten === Seq(0))
  }

  test("VCF pragma probe finds ##key=value headers") {
    val df = Parsers.vcfPragmas(spark, fixture("sample.vcf"))
    val m = df.as[(String, String)].collect().toMap
    assert(m("parametersName") === "IonTorrent Params")
    assert(m("fileUTCtime") === "2016-04-12T10:11:12")
  }

  test("checksum manifest: hex + relpath, junk lines dropped") {
    val df = Parsers.readChecksumManifest(spark, fixture("manifest.sha256"))
    assert(df.count() === 2)
    assert(rows(df.select("relpath")).flatten.toSet ===
      Set("data/file1.fastq.gz", "data/file2.fastq.gz"))
    assert(rows(df.select(length(col("sha256")))).flatten.toSet === Set(64))
  }

  test("mzML probe: first startTimeStamp + instrument accession, no XML parse") {
    val df = Parsers.mzmlProbe(spark, fixture("sample.mzml"))
    val m = df.as[(String, String)].collect().toMap
    assert(m("startTimeStamp") === "2016-06-02T09:10:11Z")
    assert(m("instrumentAccession") === "MS:1001911")
  }

  test("lineScan extracts labeled regex fields with line numbers") {
    val text = Seq("Auftragsnummer: 4711\nRIN: 7.9\nnoise").toDF("text")
    val r = Parsers.lineScan(text, "text", Map(
      "order" -> "Auftragsnummer: (\\d+)",
      "rin" -> "RIN: ([0-9.]+)"))
    val m = r.select("label", "value").as[(String, String)].collect().toMap
    assert(m === Map("order" -> "4711", "rin" -> "7.9"))
  }
}
