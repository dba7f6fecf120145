package graft.pipelines

import graft.core.Errors
import graft.functions.Barcode
import graft.operators.{Catalog, Joins, Sequencing, Validate}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship dropbox — fastq registration
  * (register-fastq-dropbox.py) — as one declarative composition
  * (SURVEY §7 step 3, the v0 end-to-end slice):
  *
  *   incoming file → barcode extract (P1) → checksum validate (P2) →
  *   catalog sample lookup (J6, miss = error not abort) → next free
  *   run number per project (W2) → idempotent dataset append (K1) →
  *   per-project report (A1).
  *
  * Everything is one lazy plan per output; nothing loops on the driver.
  * Bad rows flow out the error channel (§7 error taxonomy) instead of
  * killing the batch.
  */
object FastqPipeline {
  case class Result(registered: DataFrame, errors: DataFrame, report: DataFrame)

  /** @param incoming  rows with a `path` column (e.g. Files.binaryScan)
    * @param samples   catalog sample table (code, space, sampleType, experiment)
    * @param datasets  existing dataset table (code, dsType, sample, path)
    */
  def run(incoming: DataFrame, samples: DataFrame, datasets: DataFrame): Result = {
    // P1/P2: identity out of the filename, validity as data not aborts.
    val parsed = incoming
      .withColumn("barcode", Barcode.extract(col("path")))
      .transform(Errors.tag(_, length(col("barcode")) === 0, Errors.MetadataFormatting))
      .transform(Errors.tag(_, length(col("barcode")) > 0 && !Barcode.isValid(col("barcode")),
        Errors.ChecksumMismatch))

    // J6: barcode → sample row; missing sample is an error row (P7).
    val looked = Joins.lookup(parsed, samples.withColumnRenamed("code", "barcode"),
      Seq("barcode"))
    val tagged = Errors.tag(looked, col("__miss") && size(col("__errors")) === 0,
      Errors.SampleNotFound).drop("__miss")

    val (ok, errors) = Errors.split(tagged)

    // W2: next free run number per project (existing = prior datasets).
    val existing = datasets
      .select(Barcode.project(col("sample")).as("group"),
        coalesce(regexp_extract(col("code"), "_(\\d+)$", 1).cast("long"), lit(0L)).as("num"))
    val withProject = ok.withColumn("project", Barcode.project(col("barcode")))
    val numbered = Sequencing.nextIds(existing, withProject, "project", col("path"))

    // K1: deterministic dataset code → idempotent append.
    val newDatasets = numbered.select(
      concat(col("barcode"), lit("_"), col("new_id")).as("code"),
      lit("FASTQ").as("dsType"),
      col("barcode").as("sample"),
      col("path"))
    val registered = Catalog.appendNew(
      datasets.select("code", "dsType", "sample", "path"),
      newDatasets, Seq("sample", "path"))

    // A1: datasets per project.
    val report = registered
      .groupBy(Barcode.project(col("sample")).as("project"))
      .agg(count(lit(1)).as("n_datasets"))

    Result(registered, errors, report)
  }

  case class MetaResult(base: Result, experiments: DataFrame,
                        metaStatus: DataFrame)

  /** register-fastq-dropbox-with-metadata
    * (register-fastq-with-metadata-dropbox.py:44-70): the fastq arc
    * plus a `.metadata` JSON sidecar whose three recognized keys land
    * as properties on the EXPERIMENTS of the successfully registered
    * samples (set_meta_data: experiment-type → Q_SEQUENCING_TYPE,
    * sequencer-device → Q_SEQUENCER_DEVICE, additional-info →
    * Q_ADDITIONAL_INFO). One sidecar per dropbox batch, exactly as the
    * reference's find_meta_data_json. Divergence, deliberate: the
    * reference indexes the dict unguarded (a sidecar MISSING a key
    * raises KeyError and aborts the transaction); here an absent or
    * empty key just skips — errors are data, not aborts. */
  def runWithMetadata(incoming: DataFrame, samples: DataFrame,
                      datasets: DataFrame, experiments: DataFrame,
                      metadataJson: String): MetaResult = {
    val spark = incoming.sparkSession
    import spark.implicits._
    val base = run(incoming, samples, datasets)
    val keyMap = Seq("experiment-type" -> "Q_SEQUENCING_TYPE",
      "sequencer-device" -> "Q_SEQUENCER_DEVICE",
      "additional-info" -> "Q_ADDITIONAL_INFO")
    val parsed = spark.read.json(Seq(metadataJson).toDS())
    val kvParts = keyMap.collect {
      case (jk, prop) if parsed.columns.contains(jk) =>
        parsed.select(lit(prop).as("prop"),
          col("`" + jk + "`").cast("string").as("value"))
    }
    if (kvParts.isEmpty)
      MetaResult(base, experiments,
        experiments.limit(0).select(col("code"),
          lit("").as("status")))
    else {
      val kv = kvParts.reduce(_ unionByName _)
        .filter(col("value").isNotNull && col("value") =!= "")
      // the experiments whose samples actually registered this batch
      val target = base.registered
        .join(samples.select(col("code").as("sample"), col("experiment")),
          Seq("sample"))
        .select(col("experiment").as("code")).distinct()
      // |experiments-of-batch| × ≤3 sidecar props — the broadcast side
      // is the constant-sized prop list, never data
      val updates = target.crossJoin(broadcast(kv))
      val upd = MutationServices.updatePropsByCode(experiments, updates)
      MetaResult(base, upd.samples, upd.status)
    }
  }
}
