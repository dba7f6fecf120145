package graft.pipelines

import graft.SparkSpec
import graft.functions.Barcode
import org.apache.spark.sql.functions._

/** Parameterized prefix-registry dropbox families
  * (register-qpcr-dropbox.py, register-nmr.py, register-fasta-dropbox.py):
  * first-free experiment suffixes, letter-skip sequence arithmetic,
  * numbered-prefix samples. The full NMR composition is gated by q_nmr. */
class PrefixRegistrySpec extends SparkSpec {
  import spark.implicits._

  private def code(prefix9: String): String =
    Seq(1).toDF("x")
      .select(concat(lit(prefix9), Barcode.checksumChar(lit(prefix9))).as("c"))
      .collect()(0).getString(0)

  test("seqBarcode: numbers 001-999 within a letter, then the next letter") {
    val df = Seq(1L, 2L, 999L, 1000L, 1001L, 1998L, 1999L).toDF("idx")
      .select(col("idx"),
        PrefixRegistryPipeline.seqBarcode(lit("QABCD"), col("idx")).as("c"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == code("QABCD001A"))
    assert(m(999L) == code("QABCD999A"))
    assert(m(1000L) == code("QABCD001B"))
    assert(m(1998L) == code("QABCD999B"))
    assert(m(1999L) == code("QABCD001C"))
  }

  test("seqBarcode: Y and Z never appear; past X999 is NULL") {
    // letter 24 = X is the last usable letter
    val lastX = 23L * 999L + 999L
    val df = Seq(23L * 999L + 1L, lastX, lastX + 1L).toDF("idx")
      .select(col("idx"),
        PrefixRegistryPipeline.seqBarcode(lit("QABCD"), col("idx")).as("c"))
    val rows = df.collect()
    assert(rows(0).getString(1) == code("QABCD001X"))
    assert(rows(1).getString(1) == code("QABCD999X"))
    assert(rows(2).isNullAt(1))
    assert(!PrefixRegistryPipeline.SeqLetters.contains('Y') &&
      !PrefixRegistryPipeline.SeqLetters.contains('Z'))
  }

  test("firstFreeSuffixes fills gaps in order, then extends past max") {
    val existing = Seq(("P1", 1L), ("P1", 2L), ("P1", 4L), ("P1", 7L))
      .toDF("project", "num")
    val fresh = Seq(("P1", "a"), ("P1", "b"), ("P1", "c"), ("P1", "d"), ("P2", "e"))
      .toDF("project", "path")
    val out = PrefixRegistryPipeline
      .firstFreeSuffixes(existing, fresh, "project", col("path"))
      .select("path", "exp_num").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // free slots of P1: 3, 5, 6, 8 …; P2 has nothing existing → 1
    assert(out == Map("a" -> 3L, "b" -> 5L, "c" -> 6L, "d" -> 8L, "e" -> 1L))
  }

  test("generic run: qPCR family registers PCR-prefixed runs + datasets") {
    val bc = code("QTST1001E")
    val incoming = Seq(s"/in/$bc.xlsx", "/in/garbage.xlsx").toDF("path")
    val samples = Seq((bc, "Q_TEST_SAMPLE")).toDF("code", "sampleType")
    val experiments = Seq(("QTST1", 1L, "Q_HT_QPCR")).toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val res = PrefixRegistryPipeline.run(PrefixRegistryPipeline.Families("qpcr"),
      incoming, samples, experiments, datasets)
    val ds = res.datasets.collect()
    assert(ds.length == 1)
    assert(ds(0).getAs[String]("code") == s"PCR$bc")
    assert(ds(0).getAs[String]("dsType") == "Q_HT_QPCR_DATA")
    // suffix 1 is used → first free is 2
    assert(res.samples.select("exp_num").collect()(0).getLong(0) == 2L)
    val errs = res.errors.select("path").collect().map(_.getString(0))
    assert(errs.toSeq == Seq("/in/garbage.xlsx"))
  }

  test("generic run: FASTA numbered prefix counts per parent") {
    val bc = code("QTST2002E")
    val incoming = Seq(s"/in/${bc}_run1.fasta", s"/in/${bc}_run2.fasta").toDF("path")
    val samples = Seq((bc, "Q_TEST_SAMPLE")).toDF("code", "sampleType")
    val experiments = Seq.empty[(String, Long, String)].toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val res = PrefixRegistryPipeline.run(PrefixRegistryPipeline.Families("fasta"),
      incoming, samples, experiments, datasets)
    val codes = res.samples.select("code").collect().map(_.getString(0)).sorted
    assert(codes.toSeq == Seq(s"FASTA1$bc", s"FASTA2$bc"))
  }

  test("runNmr: test parent reuses measurement experiment, no molecule") {
    val bc = code("QNMRX001E")
    val incoming = Seq(s"/in/$bc.zip").toDF("path")
    val samples = Seq((bc, "Q_TEST_SAMPLE")).toDF("code", "sampleType")
    val experiments = Seq(("QNMRX", 3L, "Q_NMR_MEASUREMENT"))
      .toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val usedSeq = Seq.empty[(String, Long)].toDF("project", "idx")
    val res = PrefixRegistryPipeline.runNmr(incoming, samples, experiments,
      datasets, usedSeq)
    val srows = res.samples.collect()
    assert(srows.length == 1) // run sample only, no intermediate
    assert(srows(0).getAs[String]("code") == s"NMR$bc")
    assert(srows(0).getAs[Long]("exp_num") == 3L)
    assert(res.experiments.count() == 0) // reused, not created
  }

  test("runNmr: non-test parent gets a letter-skip molecule sample") {
    val bc = code("QNMRX002E")
    val incoming = Seq(s"/in/$bc.zip").toDF("path")
    val samples = Seq((bc, "Q_TISSUE")).toDF("code", "sampleType")
    val experiments = Seq(("QNMRX", 1L, "Q_SAMPLE_PREPARATION"))
      .toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val usedSeq = Seq(("QNMRX", 999L)).toDF("project", "idx")
    val res = PrefixRegistryPipeline.runNmr(incoming, samples, experiments,
      datasets, usedSeq)
    val mol = code("QNMRX001B") // base 999 → next index is 001 of letter B
    val byType = res.samples.collect()
      .map(r => r.getAs[String]("sampleType") -> r.getAs[String]("code")).toMap
    assert(byType("Q_TEST_SAMPLE") == mol)
    assert(byType("Q_NMR_SAMPLE_RUN") == s"NMR$mol")
    // error when no preparation experiment exists
    val res2 = PrefixRegistryPipeline.runNmr(incoming, samples,
      experiments.filter(lit(false)), datasets, usedSeq)
    assert(res2.errors.count() == 1)
    assert(res2.samples.count() == 0)
  }

  test("qcml/fastqc: experiment reused by type, else created as count+1") {
    val bc = code("QQCTA001E")
    val incoming = Seq(s"/in/$bc.qcml").toDF("path")
    val samples = Seq((bc, "Q_TEST_SAMPLE")).toDF("code", "sampleType")
    // project owns an MS-QC experiment (num 2) among 3 total
    val experiments = Seq(("QQCTA", 1L, "X"),
      ("QQCTA", 2L, "Q_EXT_MS_QUALITYCONTROL"), ("QQCTA", 3L, "X"))
      .toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val qc = PrefixRegistryPipeline.run(PrefixRegistryPipeline.Families("qcml"),
      incoming, samples, experiments, datasets)
    val row = qc.samples.collect()(0)
    assert(row.getAs[String]("code") == s"MSQC$bc")
    assert(row.getAs[String]("sampleType") == "Q_EXT_MS_QUALITYCONTROL_RUN")
    assert(row.getAs[Long]("exp_num") == 2L) // reused
    assert(qc.experiments.count() == 0)      // nothing created
    // fastqc over the same catalog has no NGS-QC experiment → count+1 = 4
    val fq = PrefixRegistryPipeline.run(
      PrefixRegistryPipeline.Families("fastqc"),
      Seq(s"/in/${bc}_fastqc.zip").toDF("path"), samples, experiments, datasets)
    assert(fq.samples.collect()(0).getAs[Long]("exp_num") == 4L)
    assert(fq.experiments.collect()(0).getAs[Long]("num") == 4L)
  }

  test("peptidedata: dataset attaches to the parent, idempotently") {
    val bc = code("QPEPA001E")
    val incoming = Seq(s"/in/$bc.pep.xml", s"/in/${bc}_b.pep.xml").toDF("path")
    val samples = Seq((bc, "Q_TEST_SAMPLE")).toDF("code", "sampleType")
    val experiments = Seq.empty[(String, Long, String)]
      .toDF("project", "num", "expType")
    // one of the two incoming attaches is already registered
    val datasets = Seq((bc, "Q_PEPTIDE_DATA", bc, s"/in/$bc.pep.xml"))
      .toDF("code", "dsType", "sample", "path")
    val res = PrefixRegistryPipeline.run(
      PrefixRegistryPipeline.Families("peptidedata"),
      incoming, samples, experiments, datasets)
    val ds = res.datasets.collect()
    assert(ds.length == 2) // seed kept, duplicate not re-attached
    assert(ds.forall(_.getAs[String]("sample") == bc))
    assert(ds.forall(_.getAs[String]("dsType") == "Q_PEPTIDE_DATA"))
    assert(res.samples.count() == 0 && res.experiments.count() == 0)
  }

  test("runEpitope: VAC numbers refill catalog gaps; exp suffix from count+1") {
    val bc = code("QEPTA001E")
    val wf = "QEPTAE01A1"
    val incoming = Seq(s"/in/${bc}__${wf}_epitopes.txt",
      s"/in/${bc}__${wf}_epitopes2.txt").toDF("path")
    // catalog: the workflow sample + existing VAC1/VAC3 constructs
    val samples = Seq((wf, "Q_WF_NGS_EPITOPE_PREDICTION_RUN"),
      (s"VAC1$wf", "Q_VACCINE_CONSTRUCT"), (s"VAC3$wf", "Q_VACCINE_CONSTRUCT"))
      .toDF("code", "sampleType")
    // project QEPTA owns suffixes {1,3} (count 2) → new suffixes scan
    // upward from 3: first free >2 not in {1,3} is 4, then 5
    val experiments = Seq(("QEPTA", 1L, "Q_NGS_EPITOPE_SELECTION"),
      ("QEPTA", 3L, "Q_NGS_EPITOPE_SELECTION"))
      .toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val res = PrefixRegistryPipeline.runEpitope(incoming, samples,
      experiments, datasets)
    val got = res.samples.orderBy("code").collect()
      .map(r => (r.getAs[String]("code"), r.getAs[Long]("exp_num")))
    assert(got.toSeq == Seq((s"VAC2$wf", 4L), (s"VAC4$wf", 5L)))
    assert(res.samples.collect().forall(_.getAs[String]("parent") == wf))
    // unknown workflow sample → SAMPLE_NOT_FOUND error row
    val res2 = PrefixRegistryPipeline.runEpitope(
      Seq(s"/in/${bc}__QEPTAE99A1_x.txt").toDF("path"),
      samples, experiments, datasets)
    assert(res2.errors.count() == 1 && res2.samples.count() == 0)
  }

  test("mzML find-or-create: existing MS sample reused, dataset still lands") {
    val bc1 = code("QMZLA001E")
    val bc2 = code("QMZLA002E")
    val incoming = Seq(s"/in/$bc1.mzML", s"/in/$bc2.mzML").toDF("path")
    // MS<bc1> already registered; bc2's run sample is new
    val samples = Seq((bc1, "Q_TEST_SAMPLE"), (bc2, "Q_TEST_SAMPLE"),
      (s"MS$bc1", "Q_MS_RUN")).toDF("code", "sampleType")
    val experiments = Seq(("QMZLA", 1L, "X")).toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val res = PrefixRegistryPipeline.run(
      PrefixRegistryPipeline.Families("mzml"),
      incoming, samples, experiments, datasets)
    // only bc2 creates a sample (+ the count+1 experiment); both attach
    val created = res.samples.collect()
    assert(created.length == 1 &&
      created(0).getAs[String]("code") == s"MS$bc2")
    assert(created(0).getAs[Long]("exp_num") == 2L) // no MS exp → count+1
    assert(res.experiments.count() == 1)
    val ds = res.datasets.collect().map(_.getAs[String]("sample")).sorted
    assert(ds.toSeq == Seq(s"MS$bc1", s"MS$bc2"))
  }

  test("imgrun: IMG<n> gap-fills against the catalog per parent") {
    val bc = code("QIMGA001E")
    val incoming = Seq(s"/in/${bc}_scan1.czi", s"/in/${bc}_scan2.czi")
      .toDF("path")
    // IMG1 and IMG3 already registered → the two new runs take 2 and 4
    val samples = Seq((bc, "Q_TEST_SAMPLE"),
      (s"IMG1$bc", "Q_BMI_GENERIC_IMAGING_RUN"),
      (s"IMG3$bc", "Q_BMI_GENERIC_IMAGING_RUN"))
      .toDF("code", "sampleType")
    val experiments = Seq(("QIMGA", 1L, "Q_BMI_GENERIC_IMAGING"))
      .toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val res = PrefixRegistryPipeline.run(
      PrefixRegistryPipeline.Families("imgrun"),
      incoming, samples, experiments, datasets)
    val got = res.samples.orderBy("code").collect()
      .map(r => (r.getAs[String]("code"), r.getAs[Long]("exp_num")))
    // experiment suffixes scan from count+1 = 2 upward (bam's rule)
    assert(got.toSeq == Seq((s"IMG2$bc", 2L), (s"IMG4$bc", 3L)))
  }

  test("chipimage attaches like peptidedata with its own dataset type") {
    val bc = code("QCHPA001E")
    val res = PrefixRegistryPipeline.run(
      PrefixRegistryPipeline.Families("chipimage"),
      Seq(s"/in/$bc.tif").toDF("path"),
      Seq((bc, "Q_TEST_SAMPLE")).toDF("code", "sampleType"),
      Seq.empty[(String, Long, String)].toDF("project", "num", "expType"),
      Seq.empty[(String, String, String, String)]
        .toDF("code", "dsType", "sample", "path"))
    val ds = res.datasets.collect()
    assert(ds.length == 1 && ds(0).getAs[String]("dsType") == "Q_MA_CHIP_IMAGE"
      && ds(0).getAs[String]("sample") == bc)
  }

  test("bam: experiment suffix scans upward from count+1, not gap-filling") {
    val bc = code("QBAMA001E")
    val incoming = Seq(s"/in/$bc.bam").toDF("path")
    val samples = Seq((bc, "Q_TEST_SAMPLE")).toDF("code", "sampleType")
    // suffixes {1, 3} used, count 2 → reference walks from 3: first free
    // ABOVE the count is 4 (gap 2 must NOT refill — register-bam.py:87-92)
    val experiments = Seq(("QBAMA", 1L, "X"), ("QBAMA", 3L, "X"))
      .toDF("project", "num", "expType")
    val datasets = Seq.empty[(String, String, String, String)]
      .toDF("code", "dsType", "sample", "path")
    val res = PrefixRegistryPipeline.run(
      PrefixRegistryPipeline.Families("bam"),
      incoming, samples, experiments, datasets)
    val row = res.samples.collect()(0)
    assert(row.getAs[String]("code") == s"MP$bc")
    assert(row.getAs[Long]("exp_num") == 4L)
    assert(res.datasets.collect()(0).getAs[String]("dsType")
      == "Q_NGS_MAPPING_DATA")
  }
}
