package graft.pipelines

import graft.core.Errors
import graft.functions.Barcode
import graft.operators.{Catalog, Joins}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One config per simple prefix-registry dropbox family. The reference
  * repeats the same P1→J6→(exp assign)→sample-create→K1 shape across
  * qPCR / NMR / RMA / immunomonitoring / FASTA with only the prefix,
  * entity types, and two small rules varying:
  *
  *  - qPCR  (register-qpcr-dropbox.py:36-101):  PCR + parentCode,
  *    Q_HT_QPCR / Q_HT_QPCR_RUN / Q_HT_QPCR_DATA, first-free E#.
  *  - RMA   (register-rma-dropbox.py:23-97):    RMA + parentCode, same
  *    first-free rule.
  *  - immunomonitoring (register-immunmonitoring.py): IM + parentCode.
  *  - FASTA (register-fasta-dropbox.py:110-132): FASTA<n> + parentCode —
  *    the prefix itself carries a per-parent sequence number.
  *  - NMR   (register-nmr.py:48-130): NMR + code, REUSES an existing
  *    experiment of the measurement type, and when the parent is not a
  *    Q_TEST_SAMPLE first creates a small-molecule sample on the
  *    letter-skip barcode sequence — see [[PrefixRegistryPipeline.runNmr]].
  */
case class PrefixFamily(
    samplePrefix: String,
    expType: String,
    sampleType: String,
    dsType: String,
    numberedPrefix: Boolean = false,
    reuseExpByType: Boolean = false,
    attachToParent: Boolean = false,
    reuseSampleByCode: Boolean = false,
    expAfterExisting: Boolean = false,
    numberedFromCatalog: Boolean = false)

/** The parameterized prefix-registry dropbox (SURVEY §1.2's prefix
  * table): every simple family is ONE config through [[run]]; NMR's two
  * divergent rules get [[runNmr]]. Everything is lazy DataFrame
  * composition — per-project sequence assignment is a window over the
  * batch plus a broadcast-sized max/used-set aggregate of the catalog,
  * never a driver probe loop (the reference probes the store one
  * candidate id at a time, register-nmr.py:63-68).
  */
object PrefixRegistryPipeline {

  /** The verified family configs (file:line cites on the class doc). */
  val Families: Map[String, PrefixFamily] = Map(
    "qpcr" -> PrefixFamily("PCR", "Q_HT_QPCR", "Q_HT_QPCR_RUN", "Q_HT_QPCR_DATA"),
    "rma" -> PrefixFamily("RMA", "Q_NGS_READ_MATCH_ALIGNMENT",
      "Q_NGS_READ_MATCH_ALIGNMENT_RUN", "Q_NGS_READ_MATCH_ARCHIVE"),
    "immuno" -> PrefixFamily("IM", "Q_NGS_IMMUNE_MONITORING",
      "Q_NGS_IMMUNE_MONITORING", "Q_NGS_IMMUNE_MONITORING_DATA"),
    "fasta" -> PrefixFamily("FASTA", "Q_FASTA_INFO", "Q_FASTA",
      "Q_FASTA_DATA", numberedPrefix = true),
    "nmr" -> PrefixFamily("NMR", "Q_NMR_MEASUREMENT", "Q_NMR_SAMPLE_RUN",
      "Q_NMR_RAW_DATA"),
    // qcml (register-qcml-dropbox.py:76-91) and fastqc
    // (register-fastqc-dropbox/script.py:61-77): MSQC/NGSQC + parentCode,
    // experiment REUSED by type — the project's existing QC experiment is
    // taken, else created as count+1 (no free-suffix walk in the
    // reference for these two).
    "qcml" -> PrefixFamily("MSQC", "Q_EXT_MS_QUALITYCONTROL",
      "Q_EXT_MS_QUALITYCONTROL_RUN", "Q_EXT_MS_QUALITYCONTROL_RESULTS",
      reuseExpByType = true),
    "fastqc" -> PrefixFamily("NGSQC", "Q_EXT_NGS_QUALITYCONTROL",
      "Q_EXT_NGS_QUALITYCONTROL_RUN", "Q_EXT_NGS_QUALITYCONTROL_RESULTS",
      reuseExpByType = true),
    // peptidedata (register-peptidedata-dropbox/script.py:82-88): no new
    // sample or experiment at all — the dataset attaches DIRECTLY to the
    // found parent sample.
    "peptidedata" -> PrefixFamily("", "", "", "Q_PEPTIDE_DATA",
      attachToParent = true),
    // mzML / archived-ms-raw (register-mzml-dropbox.py:77-104,
    // register-raw.py:78-100): find-or-create the MS run sample by code,
    // experiment reused by type else created; only the dataset type
    // differs between the two.
    "mzml" -> PrefixFamily("MS", "Q_MS_MEASUREMENT", "Q_MS_RUN",
      "Q_MS_MZML_DATA", reuseExpByType = true, reuseSampleByCode = true),
    "msraw" -> PrefixFamily("MS", "Q_MS_MEASUREMENT", "Q_MS_RUN",
      "Q_MS_RAW_DATA", reuseExpByType = true, reuseSampleByCode = true),
    // bam (register-bam.py:78-133) and pacbio
    // (register-pacbio-dropbox.py:46-147): find-or-create by code,
    // experiment suffix scanned upward from count+1.
    "bam" -> PrefixFamily("MP", "Q_NGS_MAPPING", "Q_NGS_MAPPING",
      "Q_NGS_MAPPING_DATA", reuseSampleByCode = true,
      expAfterExisting = true),
    "pacbio" -> PrefixFamily("NGS", "Q_NGS_PACBIO_MEASUREMENT",
      "Q_NGS_PACBIO_RUN", "Q_NGS_PACBIO_DATA", reuseSampleByCode = true,
      expAfterExisting = true),
    // IdXML / featureXML / document / chip-image
    // (register-IdXML-dropbox.py:84, register-fXML-dropbox.py:84,
    // register-document.py:64, register-chip-image-dropbox.py:57):
    // attach-only, like peptidedata.
    "idxml" -> PrefixFamily("", "", "", "IDXML", attachToParent = true),
    "featurexml" -> PrefixFamily("", "", "", "FEATUREXML",
      attachToParent = true),
    "document" -> PrefixFamily("", "", "", "Q_DOCUMENT",
      attachToParent = true),
    "chipimage" -> PrefixFamily("", "", "", "Q_MA_CHIP_IMAGE",
      attachToParent = true),
    // omero imaging run (register-omero.py:84-132): IMG<n> numbered
    // against the CATALOG per parent (while-exists probe walks the first
    // free n — already-registered runs leave gaps that refill),
    // experiment suffix scanned upward from count+1 (:88-97). The image
    // transport itself is K6's exec seam; the dataset row records the
    // attachment.
    "imgrun" -> PrefixFamily("IMG", "Q_BMI_GENERIC_IMAGING",
      "Q_BMI_GENERIC_IMAGING_RUN", "Q_BMI_GENERIC_IMAGING_DATA",
      numberedPrefix = true, expAfterExisting = true,
      numberedFromCatalog = true),
    // epitope-selection (register-epitope-selection.py:48-88) diverges
    // enough (workflow-sample key, catalog-wide VAC<n> free-number scan,
    // experiment suffix starting past count) to get [[runEpitope]]; the
    // config row carries its type strings.
    "epitope" -> PrefixFamily("VAC", "Q_NGS_EPITOPE_SELECTION",
      "Q_VACCINE_CONSTRUCT", "Q_VACCINE_CONSTRUCT_DATA",
      numberedPrefix = true))

  /** Letters A..X — Y and Z are never used "due to international input
    * devices switching these letters" (register-nmr.py:48-50). */
  val SeqLetters = "ABCDEFGHIJKLMNOPQRSTUVWX"
  val SeqCapacity: Long = SeqLetters.length.toLong * 999L

  /** The letter-skip barcode sequence: 1-based linear index →
    * `project + NNN + letter + checksum`, numbers 001-999 within a
    * letter, letters advancing A→X (Y/Z skipped). NULL past capacity.
    *
    * The reference's getNextBarcode (register-nmr.py:51-57) advances the
    * letter when the number passes 999 but keeps the un-reset 4-digit
    * number (`str(1000).zfill(3)`) — a latent overflow its own barcode
    * regex would then reject; the engine rolls to 001 of the next
    * letter, the sequence the skip rule is there to produce. */
  def seqBarcode(project: Column, idx: Column): Column = {
    val num = pmod(idx - 1, lit(999L)) + 1
    val letterIdx = floor((idx - 1) / 999L)
    val prefix9 = concat(project, lpad(num.cast("string"), 3, "0"),
      lit(SeqLetters).substr(letterIdx.cast("int") + 1, lit(1)))
    when(idx < 1 || idx > SeqCapacity, lit(null).cast("string"))
      .otherwise(concat(prefix9, Barcode.checksumChar(prefix9)))
  }

  /** First-free experiment-suffix assignment
    * (register-qpcr-dropbox.py:88-95): the reference walks suffix 1,2,…
    * until the id is unused, so the j-th new experiment of a project in
    * a batch takes the j-th SMALLEST free suffix — gap-filling, not
    * max+1 (W2's rule). Distributed form: per-project used-set +
    * max as a bounded aggregate (experiments-per-project is small),
    * row_number over the batch, j-th free slot found in-row with a
    * bounded `sequence` (the j-th free suffix is ≤ max_used + j).
    *
    * @param existing      (project, num) used suffixes
    * @param fresh         batch rows carrying `projectCol`
    * @param afterExisting scan for free suffixes strictly ABOVE the
    *                      existing COUNT instead of from 1 — the epitope
    *                      experiment rule (register-epitope-selection.py:
    *                      73-79 starts at len(existing)+1 and walks up),
    *                      vs the qPCR gap-filling walk from 1.
    * @return fresh plus `exp_num`
    */
  def firstFreeSuffixes(existing: DataFrame, fresh: DataFrame,
                        projectCol: String, orderBy: Column,
                        afterExisting: Boolean = false): DataFrame = {
    val agg = existing
      .groupBy(col("project").as("__ff_proj"))
      .agg(collect_set(col("num").cast("long")).as("__used"),
        max(col("num").cast("long")).as("__maxn"),
        count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(projectCol)).orderBy(orderBy)
    // j-th free suffix above `floor` is ≤ max(maxn, floor) + j: the range
    // (floor, max(maxn,floor)+j] holds at most maxn-floor used values, so
    // at least j frees — the in-row `sequence` stays bounded.
    val floor =
      if (afterExisting) coalesce(col("__cnt"), lit(0L)) else lit(0L)
    fresh.join(broadcast(agg), fresh(projectCol) === col("__ff_proj"), "left")
      .drop("__ff_proj")
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__frees",
        filter(sequence(lit(1L),
          greatest(coalesce(col("__maxn"), lit(0L)), floor) + col("__rank")),
          x => x > floor && !array_contains(coalesce(col("__used"),
            array().cast("array<long>")), x)))
      .withColumn("exp_num",
        element_at(slice(col("__frees"), col("__rank").cast("int"), lit(1)), 1))
      .drop("__used", "__maxn", "__cnt", "__rank", "__frees")
  }

  case class Result(datasets: DataFrame, samples: DataFrame,
                    experiments: DataFrame, errors: DataFrame)

  /** The common qPCR/RMA/IM/FASTA shape: extract + validate the barcode
    * (P1/P2), look up the parent sample (J6; miss = error row), assign
    * each batch row a first-free experiment suffix, derive the run
    * sample `<prefix>[<n>]<parentCode>`, and idempotently append the
    * dataset (K1).
    *
    * @param incoming    rows with a `path` column
    * @param samples     catalog samples (code, space, sampleType)
    * @param experiments catalog experiments (project, num, expType)
    * @param datasets    existing datasets (code, dsType, sample, path)
    */
  def run(family: PrefixFamily, incoming: DataFrame, samples: DataFrame,
          experiments: DataFrame, datasets: DataFrame): Result = {
    val parsed = incoming
      .withColumn("barcode", Barcode.extract(col("path")))
      .transform(Errors.tag(_, length(col("barcode")) === 0, Errors.MetadataFormatting))
      .transform(Errors.tag(_,
        length(col("barcode")) > 0 && !Barcode.isValid(col("barcode")),
        Errors.ChecksumMismatch))
    val looked = Joins.lookup(parsed,
      samples.withColumnRenamed("code", "barcode"), Seq("barcode"))
    val tagged = Errors.tag(looked, col("__miss") && size(col("__errors")) === 0,
      Errors.SampleNotFound).drop("__miss")
    val (ok, errors) = Errors.split(tagged)

    // peptidedata's whole registration is one dataset attach to the found
    // parent — no experiment, no run sample (script.py:82-88).
    if (family.attachToParent) {
      val newDatasets = Catalog.appendNew(
        datasets.select("code", "dsType", "sample", "path"),
        ok.select(col("barcode").as("code"), lit(family.dsType).as("dsType"),
          col("barcode").as("sample"), col("path")),
        Seq("sample", "path"))
      val none = ok.limit(0)
      return Result(newDatasets,
        none.select(col("barcode").as("code"), lit("").as("sampleType"),
          col("barcode").as("parent"), col("barcode").as("project"),
          lit(0L).as("exp_num")),
        none.select(col("barcode").as("project"), lit(0L).as("num"),
          lit("").as("expType")),
        errors)
    }

    val withProject = ok.withColumn("project", Barcode.project(col("barcode")))

    // Run-sample name first — FASTA's numbered prefix counts per PARENT
    // within the batch (vcNumber, register-fasta-dropbox.py:121-130),
    // plain families use the bare prefix — so the find-or-create probe
    // below can split the batch BEFORE experiment suffixes are assigned.
    val wp = Window.partitionBy(col("barcode")).orderBy(col("path"))
    val named =
      if (family.numberedPrefix && family.numberedFromCatalog) {
        // omero's IMG<n> rule: n is the first FREE number per parent
        // against the CATALOG's already-registered runs (the while-
        // exists probe of register-omero.py:119-128), not a batch-local
        // counter — decompose existing `<prefix><n><barcode>` codes into
        // per-parent used sets and gap-fill (the VAC machinery keyed on
        // the barcode).
        val pfx = java.util.regex.Pattern.quote(family.samplePrefix)
        val rx = s"^$pfx([0-9]+)(${Barcode.Rx})$$"
        val used = samples
          .select(regexp_extract(col("code"), rx, 2).as("project"),
            regexp_extract(col("code"), rx, 1).as("__n"))
          .filter(length(col("project")) > 0)
          .select(col("project"), col("__n").cast("long").as("num"))
        firstFreeSuffixes(used,
          withProject.withColumnRenamed("project", "__pr_proj")
            .withColumnRenamed("barcode", "project"),
          "project", col("path"))
          .withColumn("run_sample",
            concat(lit(family.samplePrefix), col("exp_num").cast("string"),
              col("project")))
          .drop("exp_num")
          .withColumnRenamed("project", "barcode")
          .withColumnRenamed("__pr_proj", "project")
      } else if (family.numberedPrefix)
        withProject.withColumn("run_sample",
          concat(lit(family.samplePrefix),
            row_number().over(wp).cast("string"), col("barcode")))
      else
        withProject.withColumn("run_sample",
          concat(lit(family.samplePrefix), col("barcode")))

    // mzML/bam/pacbio find-or-create: when `MS<code>`/`MP<code>` is
    // already registered the dataset attaches to IT — no new sample, no
    // new experiment, and crucially no experiment suffix consumed
    // (register-mzml-dropbox.py:85-101, register-bam.py:120-131).
    val flagged =
      if (family.reuseSampleByCode)
        named.join(broadcast(samples.select(col("code").as("run_sample"))
            .distinct().withColumn("__s_hit", lit(true))),
          Seq("run_sample"), "left")
          .withColumn("__s_exists", coalesce(col("__s_hit"), lit(false)))
          .drop("__s_hit")
      else named.withColumn("__s_exists", lit(false))
    val creators = flagged.filter(!col("__s_exists"))
    val reusers = flagged.filter(col("__s_exists"))

    // Experiment assignment (creating rows only): qPCR/RMA/IM/FASTA walk
    // the first FREE suffix per registration from 1 (gap-filling);
    // bam/pacbio scan upward from count+1 (register-bam.py:87-92);
    // qcml/fastqc/mzML REUSE the project's existing experiment of the
    // family type, creating it as count+1 only when absent
    // (register-qcml-dropbox.py:76-84) — so every batch row of a project
    // shares ONE suffix there.
    val prefixed =
      if (family.reuseExpByType) {
        val expAgg = experiments
          .groupBy(col("project").as("__ex_proj"))
          .agg(max(when(col("expType") === family.expType,
            col("num").cast("long"))).as("__reuse"),
            count(lit(1)).as("__n_exp"))
        creators
          .join(broadcast(expAgg), col("project") === col("__ex_proj"), "left")
          .drop("__ex_proj")
          .withColumn("exp_num",
            coalesce(col("__reuse"), coalesce(col("__n_exp"), lit(0L)) + 1L))
          .withColumn("__exp_created", col("__reuse").isNull)
          .drop("__reuse", "__n_exp")
      } else firstFreeSuffixes(
        experiments.select(col("project"), col("num")),
        creators, "project", col("path"),
        afterExisting = family.expAfterExisting)
        .withColumn("__exp_created", lit(true))

    val newExperiments = prefixed.filter(col("__exp_created"))
      .select(col("project"), col("exp_num").as("num"),
        lit(family.expType).as("expType")).distinct()
    val newSamples = prefixed.select(
      col("run_sample").as("code"), lit(family.sampleType).as("sampleType"),
      col("barcode").as("parent"), col("project"), col("exp_num"))
    val dsRows = prefixed
      .select(col("run_sample").as("code"), lit(family.dsType).as("dsType"),
        col("run_sample").as("sample"), col("path"))
      .unionByName(reusers.select(col("run_sample").as("code"),
        lit(family.dsType).as("dsType"),
        col("run_sample").as("sample"), col("path")))
    val newDatasets = Catalog.appendNew(
      datasets.select("code", "dsType", "sample", "path"),
      dsRows, Seq("sample", "path"))
    Result(newDatasets, newSamples, newExperiments, errors)
  }

  /** NMR's divergent instance (register-nmr.py:74-130). Two rules on
    * top of [[run]]'s shape:
    *
    *  1. Experiment REUSE, branch-dependent: a Q_TEST_SAMPLE parent
    *     reuses the project's existing Q_NMR_MEASUREMENT experiment
    *     (created as count+1 when absent, register-nmr.py:111-118); any
    *     other parent must find an existing Q_SAMPLE_PREPARATION
    *     experiment (none existing = error row — the reference would
    *     crash on exp=None, register-nmr.py:120-127).
    *  2. A non-test parent first gets a small-molecule intermediate
    *     sample on the letter-skip sequence ([[seqBarcode]]), the run
    *     sample then hangs off THAT code (createSmallMoleculeSample,
    *     register-nmr.py:59-68); the run sample is `NMR<code>` either way.
    *
    * Where the reference iterates experiments and takes the last match
    * of the type, the engine takes max(num) — deterministic under the
    * same single-writer batch discipline. `usedSeq` carries the
    * already-consumed letter-skip indices per project (max-aggregated);
    * sequence exhaustion (past X999) is an error row, not a crash.
    */
  def runNmr(incoming: DataFrame, samples: DataFrame,
             experiments: DataFrame, datasets: DataFrame,
             usedSeq: DataFrame): Result = {
    val family = Families("nmr")
    val parsed = incoming
      .withColumn("barcode", Barcode.extract(col("path")))
      .transform(Errors.tag(_, length(col("barcode")) === 0, Errors.MetadataFormatting))
      .transform(Errors.tag(_,
        length(col("barcode")) > 0 && !Barcode.isValid(col("barcode")),
        Errors.ChecksumMismatch))
    val looked = Joins.lookup(parsed,
      samples.withColumnRenamed("code", "barcode"), Seq("barcode"))
    val tagged = Errors.tag(looked, col("__miss") && size(col("__errors")) === 0,
      Errors.SampleNotFound).drop("__miss")

    val withProject = tagged.withColumn("project", Barcode.project(col("barcode")))
      .withColumn("is_test", col("sampleType") === "Q_TEST_SAMPLE")

    // Rule 1: per-project experiment of each type, max num (bounded agg,
    // broadcast); count of ALL experiments feeds the create-as-count+1.
    val expAgg = experiments.groupBy(col("project").as("__ex_proj")).agg(
      max(when(col("expType") === "Q_NMR_MEASUREMENT", col("num"))).as("__nmr_exp"),
      max(when(col("expType") === "Q_SAMPLE_PREPARATION", col("num"))).as("__prep_exp"),
      count(lit(1)).as("__n_exp"))
    val withExp = withProject
      .join(broadcast(expAgg), col("project") === col("__ex_proj"), "left")
      .drop("__ex_proj")
      .withColumn("exp_num",
        when(col("is_test"), coalesce(col("__nmr_exp"), coalesce(col("__n_exp"), lit(0L)) + 1))
          .otherwise(col("__prep_exp")))
      .withColumn("exp_created", col("is_test") && col("__nmr_exp").isNull)
      .transform(Errors.tag(_,
        !col("is_test") && col("exp_num").isNull && size(col("__errors")) === 0,
        Errors.ExperimentNotFound))
      .drop("__nmr_exp", "__prep_exp", "__n_exp")

    // Rule 2: letter-skip intermediate sample for non-test parents.
    // Only rows that will actually register consume sequence indices —
    // an error row's reference transaction aborts before any sample
    // creation, so it must not burn a barcode (is_test is NULL on a
    // failed lookup; treat it as non-consuming too).
    val seqAgg = usedSeq.groupBy(col("project").as("__sq_proj"))
      .agg(max(col("idx").cast("long")).as("__sq_max"))
    val w = Window.partitionBy(col("project")).orderBy(col("path"))
    val consumes = !coalesce(col("is_test"), lit(true)) &&
      size(col("__errors")) === 0
    val withSeq = withExp
      .join(broadcast(seqAgg), col("project") === col("__sq_proj"), "left")
      .drop("__sq_proj")
      .withColumn("__seq_rank",
        sum(when(consumes, 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("seq_idx",
        when(consumes, coalesce(col("__sq_max"), lit(0L)) + col("__seq_rank"))
          .otherwise(lit(null).cast("long")))
      .withColumn("molecule_sample",
        when(col("seq_idx").isNotNull, seqBarcode(col("project"), col("seq_idx")))
          .otherwise(lit(null).cast("string")))
      .transform(Errors.tag(_,
        col("seq_idx").isNotNull && col("molecule_sample").isNull,
        Errors.SampleAlreadyCreated))
      .drop("__sq_max", "__seq_rank")

    val (ok, errors) = Errors.split(withSeq)
    val base = ok.withColumn("attach_code",
      coalesce(col("molecule_sample"), col("barcode")))
      .withColumn("run_sample", concat(lit(family.samplePrefix), col("attach_code")))

    val newExperiments = base.filter(col("exp_created"))
      .select(col("project"), col("exp_num").as("num"),
        lit(family.expType).as("expType")).distinct()
    val molecules = base.filter(col("molecule_sample").isNotNull)
      .select(col("molecule_sample").as("code"),
        lit("Q_TEST_SAMPLE").as("sampleType"), col("barcode").as("parent"),
        col("project"), col("exp_num"))
    val runs = base.select(col("run_sample").as("code"),
      lit(family.sampleType).as("sampleType"),
      col("attach_code").as("parent"), col("project"), col("exp_num"))
    val newDatasets = Catalog.appendNew(
      datasets.select("code", "dsType", "sample", "path"),
      base.select(col("run_sample").as("code"), lit(family.dsType).as("dsType"),
        col("run_sample").as("sample"), col("path")),
      Seq("sample", "path"))
    Result(newDatasets, molecules.unionByName(runs), newExperiments, errors)
  }

  /** The workflow-sample pattern epitope files carry
    * (register-epitope-selection.py:17-18): `Q<4>E<2><2>`. */
  val WfSamplePattern = "Q[A-Z0-9]{4}E[0-9]{2}[A-Z0-9]{2}"

  /** Epitope-selection's divergent instance
    * (register-epitope-selection.py:30-88). Three rules on top of
    * [[run]]'s shape:
    *
    *  1. The lookup key is the WORKFLOW sample code (`Q<4>E<2><2>`,
    *     sPattern at :18,33), not the barcode; the barcode still
    *     supplies the project (:35-36).
    *  2. The new sample is `VAC<n><wfSample>` where n is the first
    *     FREE number per workflow sample — the reference walks n=1,2,…
    *     against every existing sample id of the project (:47-62), so
    *     already-registered VAC constructs leave gaps that refill.
    *     That is [[firstFreeSuffixes]] keyed on the wf code, fed the
    *     catalog's decomposed VAC numbers.
    *  3. A NEW experiment per registration, suffix scanned upward FROM
    *     count+1 (`len(existing)+1`, then while-collision ++, :73-79) —
    *     [[firstFreeSuffixes]] with `afterExisting = true`.
    */
  def runEpitope(incoming: DataFrame, samples: DataFrame,
                 experiments: DataFrame, datasets: DataFrame): Result = {
    val family = Families("epitope")
    val parsed = incoming
      .withColumn("barcode", Barcode.extract(col("path")))
      .withColumn("wf_sample",
        regexp_extract(col("path"), WfSamplePattern, 0))
      .transform(Errors.tag(_,
        length(col("barcode")) === 0 || length(col("wf_sample")) === 0,
        Errors.MetadataFormatting))
      .transform(Errors.tag(_,
        length(col("barcode")) > 0 && !Barcode.isValid(col("barcode")),
        Errors.ChecksumMismatch))
    val looked = Joins.lookup(parsed,
      samples.select(col("code").as("wf_sample"),
        col("sampleType").as("__wf_type")), Seq("wf_sample"))
    val tagged = Errors.tag(looked, col("__miss") && size(col("__errors")) === 0,
      Errors.SampleNotFound).drop("__miss", "__wf_type")
    val (ok, errors) = Errors.split(tagged)
    val withProject = ok.withColumn("project", Barcode.project(col("barcode")))

    // Rule 2: decompose existing VAC<n><wf> codes into (wf, n) used pairs;
    // per-wf used sets are small (constructs per workflow sample), so the
    // free-number join stays broadcast.
    val vacUsed = samples
      .select(regexp_extract(col("code"),
        s"^VAC([0-9]+)($WfSamplePattern)$$", 2).as("project"),
        regexp_extract(col("code"),
          s"^VAC([0-9]+)($WfSamplePattern)$$", 1).as("__n"))
      .filter(length(col("project")) > 0)
      .select(col("project"), col("__n").cast("long").as("num"))
    val vacNumbered = firstFreeSuffixes(vacUsed,
      withProject.withColumnRenamed("project", "__proj_keep")
        .withColumnRenamed("wf_sample", "project"),
      "project", col("path"))
      .withColumnRenamed("exp_num", "vac_num")
      .withColumnRenamed("project", "wf_sample")
      .withColumnRenamed("__proj_keep", "project")

    // Rule 3: experiment suffix from count+1 upward.
    val numbered = firstFreeSuffixes(
      experiments.select(col("project"), col("num")),
      vacNumbered, "project", col("path"), afterExisting = true)

    val prefixed = numbered.withColumn("run_sample",
      concat(lit(family.samplePrefix), col("vac_num").cast("string"),
        col("wf_sample")))
    val newExperiments = prefixed
      .select(col("project"), col("exp_num").as("num"),
        lit(family.expType).as("expType")).distinct()
    val newSamples = prefixed.select(
      col("run_sample").as("code"), lit(family.sampleType).as("sampleType"),
      col("wf_sample").as("parent"), col("project"), col("exp_num"))
    val newDatasets = Catalog.appendNew(
      datasets.select("code", "dsType", "sample", "path"),
      prefixed.select(col("run_sample").as("code"),
        lit(family.dsType).as("dsType"),
        col("run_sample").as("sample"), col("path")),
      Seq("sample", "path"))
    Result(newDatasets, newSamples, newExperiments, errors)
  }
}
