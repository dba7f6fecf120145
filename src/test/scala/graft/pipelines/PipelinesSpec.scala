package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FastqPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    ("QABCD001A0", "SPACE1", "Q_TEST_SAMPLE", "/SPACE1/QABCD/QABCDE1"),
    ("QTEST005XM", "SPACE2", "Q_TEST_SAMPLE", "/SPACE2/QTEST/QTESTE1")
  ).toDF("code", "space", "sampleType", "experiment")

  private val emptyDatasets = Seq.empty[(String, String, String, String)]
    .toDF("code", "dsType", "sample", "path")

  private val incoming = Seq(
    "drop/QABCD001A0_reads.fastq.gz",   // ok
    "drop/QTEST005XM_reads.fastq.gz",   // ok
    "drop/QABCD001A1_reads.fastq.gz",   // bad checksum
    "drop/QZZZZ009BN_reads.fastq.gz",   // not in catalog (valid shape or not — errors either way)
    "drop/readme.txt"                   // no barcode
  ).toDF("path")

  test("valid files register, bad rows flow out the error channel") {
    val r = FastqPipeline.run(incoming, samples, emptyDatasets)
    assert(r.registered.count() === 2)
    assert(r.errors.count() === 3)
    val codes = r.registered.select("code").as[String].collect().toSet
    assert(codes === Set("QABCD001A0_1", "QTEST005XM_1"))
    val rep = r.report.as[(String, Long)].collect().toMap
    assert(rep === Map("QABCD" -> 1L, "QTEST" -> 1L))
  }

  test("re-running the same batch is idempotent (K1)") {
    val once = FastqPipeline.run(incoming, samples, emptyDatasets)
    val twice = FastqPipeline.run(incoming, samples, once.registered)
    assert(twice.registered.count() === once.registered.count())
  }

  test("run numbers continue after existing datasets (W2)") {
    val prior = Seq(("QABCD001A0_7", "FASTQ", "QABCD001A0", "old/f.fastq"))
      .toDF("code", "dsType", "sample", "path")
    val r = FastqPipeline.run(incoming, samples, prior)
    val codes = r.registered.select("code").as[String].collect().toSet
    assert(codes.contains("QABCD001A0_8")) // max existing 7 + 1
  }

  test("metadata sidecar props land on the registered samples' experiments") {
    val experiments = Seq(
      ("/SPACE1/QABCD/QABCDE1", "Q_NGS"), ("/SPACE2/QTEST/QTESTE1", "Q_NGS"),
      ("/SPACE3/QOTHR/QOTHRE1", "Q_NGS")) // no sample in this batch
      .toDF("code", "expType")
      .withColumn("props", map(lit("Q_KEEP"), lit("k")))
    val meta = """{"experiment-type": "RNA-Seq",
                  |"sequencer-device": "ILLUMINA_NOVASEQ",
                  |"additional-info": ""}""".stripMargin
    val r = FastqPipeline.runWithMetadata(incoming, samples,
      emptyDatasets, experiments, meta)
    assert(r.base.registered.count() === 2)
    val props = r.experiments.collect().map(x => x.getAs[String]("code") ->
      x.getAs[Map[String, String]]("props")).toMap
    // both touched experiments got the two non-empty keys; empty
    // additional-info skipped; untouched experiment keeps only its seed
    for (e <- Seq("/SPACE1/QABCD/QABCDE1", "/SPACE2/QTEST/QTESTE1"))
      assert(props(e) == Map("Q_KEEP" -> "k",
        "Q_SEQUENCING_TYPE" -> "RNA-Seq",
        "Q_SEQUENCER_DEVICE" -> "ILLUMINA_NOVASEQ"))
    assert(props("/SPACE3/QOTHR/QOTHRE1") == Map("Q_KEEP" -> "k"))
    val st = r.metaStatus.collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(st.values.toSet == Set("updated") && st.size == 2)
  }
}

class MsConvertPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("unpaired raw files are conversion candidates; paired are skipped") {
    val files = Seq("r/run1.raw", "r/run1.mzML", "r/run2.raw").toDF("path")
    val cands = MsConvertPipeline.conversionCandidates(files)
    assert(rows(cands.select("raw_path")).flatten === Seq("r/run2.raw"))
  }

  test("dryrun plans the reference's converter invocation") {
    val r = MsConvertPipeline.convert(Seq("a.raw").toDS(), dryrun = true).collect()
    assert(r.head.cmd === Seq("msconvert", "a.raw", "--mzML", "--outdir", "a.raw.out"))
    assert(r.head.dryrun)
  }

  test("ambiguous multi-barcode names are tagged") {
    val files = Seq("QABCD001A0_QTEST005XM.raw", "QABCD001A0.raw").toDF("path")
    val tagged = MsConvertPipeline.tagAmbiguous(files)
    assert(tagged.filter(size(col("__errors")) > 0).count() === 1)
  }
}

class NanoporePipelineSpec extends SparkSpec {
  import spark.implicits._
  import java.nio.file.{Files => JF}

  test("run tree parses to measurements with the blacklist applied") {
    val d = JF.createTempDirectory("graft-nanopore")
    JF.createDirectories(d.resolve("run1/fast5_pass"))
    JF.createDirectories(d.resolve("run1/fastq_fail"))
    JF.createDirectories(d.resolve("run1/other_reports"))
    JF.writeString(d.resolve("run1/fast5_pass/a.fast5"), "x")
    JF.writeString(d.resolve("run1/fastq_fail/b.fastq"), "x")
    JF.writeString(d.resolve("run1/other_reports/log.txt"), "x")
    val m = NanoporePipeline.measurements(spark, d.toString)
    val kinds = m.select("kind").as[String].collect().toSet
    assert(kinds === Set("fast5_pass", "fastq_fail"))
  }

  test("manifest slices group per folder under a prefix") {
    val manifest = Seq(
      ("a" * 64, "run1/fast5/x.fast5"), ("b" * 64, "run1/fastq/y.fastq"),
      ("c" * 64, "run2/fast5/z.fast5")
    ).toDF("sha256", "relpath")
    val s = NanoporePipeline.manifestSlices(manifest, "run1/")
    assert(rows(s.select("folder", "n_files")) === Seq(Seq("run1", 2L)))
  }
}

class VcfPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end: parse, join, whitelist, absent, export") {
    val sheet = Seq(("chr1", 1234L, "A", "T")).toDF("chrom", "pos", "sheet_ref", "sheet_alt")
    val panel = Seq("BRAF", "EGFR").toDF("gene")
    val out = java.nio.file.Files.createTempDirectory("graft-vcf").toString
    val (detected, absent) = VcfPipeline.run(spark,
      fixture("sample.vcf"), sheet, panel, out)
    assert(rows(detected.select("gene", "aa_change")) === Seq(Seq("BRAF", "K41N")))
    assert(rows(absent.select("gene", "status")) === Seq(Seq("EGFR", "VARIANTABSENT")))
    // exports round-trip
    assert(graft.sources.Parsers.readTsv(spark, s"$out/detected").count() === 1)
  }

  test("significance filter keeps hetero-band SNPs only") {
    val v = Seq(
      ("snp", 20.0), ("snp", 50.0), ("indel", 20.0), ("snp", 70.0)
    ).toDF("t", "freq").withColumn("info_map", map(lit("TYPE"), col("t")))
    assert(VcfPipeline.significant(v).count() === 2)
  }
}
