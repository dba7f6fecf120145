package graft.pipelines

import graft.core.Errors
import graft.functions.{Coerce, MapOps}
import graft.operators.{Joins, Validate}
import graft.sources.Parsers
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Imaging/OMERO metadata registration — the reference's largest single
  * parser, re-expressed as one declarative flow.
  *
  * Reference: register-omero-metadata/register-omero.py —
  * `findMetaDataFile`/`getPropertyNames` (:182-202, dynamic-column TSV),
  * `validatePropertyNames` (:204-215, required columns),
  * `getPropertyMap` (:217-236, per-line bag, '*' placeholders, space→_),
  * `getValidationMap` (:249-268, int/float coercion probes),
  * `filterOmeroPropertyMap` (:270-281, annotation blacklist),
  * SAMPLE_ID override (:401-419) and the IMAGE_DATA_PATH file-vs-folder
  * target routing (:392-438).
  *
  * Every stage is a column expression over the metadata frame — the bag,
  * the coercion probes and the target routing all stay inside one
  * whole-stage-codegen'd scan; the only joins are equi-key hash joins
  * against the (comparatively tiny) payload file listing.
  */
object ImagingPipeline {
  /** validatePropertyNames' REQUIRED_PROPERTY_LIST (register-omero.py:67). */
  val RequiredProperties: Seq[String] = Seq("IMAGE_DATA_PATH",
    "IMAGING_MODALITY", "IMAGED_TISSUE", "INSTRUMENT_MANUFACTURER",
    "INSTRUMENT_USER", "IMAGING_DATE")

  /** filterOmeroPropertyMap's blacklist (register-omero.py:69). */
  val OmeroFilterList: Seq[String] = Seq("IMAGE_DATA_PATH",
    "INSTRUMENT_USER", "IMAGING_DATE", "SAMPLE_ID", "OMERO_TAGS", "ETL_TAG")

  /** Normalize a dynamic TSV header the way `getPropertyNames` does:
    * trim, uppercase, spaces→underscores. */
  def normalizeHeader(df: DataFrame): DataFrame =
    df.toDF(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      df.columns.map(c => c.trim.toUpperCase.replace(" ", "_"))): _*)

  /** Read a `metadata_table.tsv` (dynamic columns, header row). */
  def readMetadataTable(spark: SparkSession, path: String): DataFrame =
    normalizeHeader(Parsers.readTsv(spark, path))

  /** Required property names absent from the header (validatePropertyNames).
    * Schema-level: decided once from the frame, not per row. */
  def missingRequired(meta: DataFrame): Seq[String] =
    Validate.missingColumns(meta, RequiredProperties)

  /** Per-row property bag (`getPropertyMap`): every metadata column into
    * one map, values space→underscore like the keys, '*' placeholder
    * entries dropped. NULL cells (short TSV lines) drop out with the
    * placeholders — the reference never sees them because `split('\t')`
    * yields only present fields. */
  def propertyBag(meta: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else meta.columns.toSeq
    val entries = names.map(c => map(lit(c), regexp_replace(col(c), " ", "_")))
    meta.withColumn("props", MapOps.dropPlaceholders(
      map_filter(map_concat(entries: _*), (_, v) => v.isNotNull)))
  }

  /** Row-level required check: a required property whose value was a
    * placeholder (or an absent cell) is missing from the bag — tag the
    * row instead of aborting the batch. */
  def tagMissingRequired(bagged: DataFrame,
                         required: Seq[String] = RequiredProperties): DataFrame = {
    val bad = required.map(r => !map_contains_key(col("props"), lit(r)))
      .reduceOption(_ || _).getOrElse(lit(false))
    Errors.tag(bagged, bad, Errors.MetadataFormatting)
  }

  /** `getValidationMap`: lowercase keys + int/float coercion probes. */
  def withValidationBag(df: DataFrame): DataFrame =
    df.withColumn("vprops", Coerce.validationMap(col("props")))

  /** `filterOmeroPropertyMap`: the annotation bag bound for the external
    * push, with the blacklisted keys removed. */
  def withOmeroBag(df: DataFrame): DataFrame =
    df.withColumn("omero_props", MapOps.dropKeys(col("props"), OmeroFilterList))

  /** SAMPLE_ID override (:401-419): a 10-char SAMPLE_ID property replaces
    * the dropbox default; project code is its first 5 chars. */
  def withSampleId(df: DataFrame, defaultSample: Column): DataFrame = {
    val sid = element_at(col("props"), "SAMPLE_ID")
    df.withColumn("sample_code",
        when(length(sid) === 10, sid).otherwise(defaultSample))
      .withColumn("project_code", substring(col("sample_code"), 1, 5))
  }

  /** All strict ancestor directory prefixes of a normalized relative
    * path: "a/b/c.tif" → ["a", "a/b"]. Bounded by path depth, so the
    * explode below is O(depth) per file, never a prefix-range join. */
  private[pipelines] def ancestorPrefixes(p: Column): Column = {
    val parts = split(p, "/")
    when(size(parts) > 1,
      transform(sequence(lit(1), size(parts) - 1),
        i => array_join(slice(parts, lit(1), i), "/")))
      .otherwise(array().cast("array<string>"))
  }

  /** IMAGE_DATA_PATH → payload target routing (:392-438): an exact path
    * match is a single-file import, a match of some file's ancestor
    * directory is a folder import, neither is a tagged error row. Both
    * probes are equi-key hash joins against distinct path sets. */
  def withImageTargets(meta: DataFrame, files: DataFrame,
                       pathCol: String = "path"): DataFrame = {
    val m = meta.withColumn("__target",
      Joins.normPath(element_at(col("props"), "IMAGE_DATA_PATH")))
    val f = files.select(Joins.normPath(col(pathCol)).as("__fp"))
    val fileHits = f.select(col("__fp").as("__target")).distinct()
      .withColumn("__is_file", lit(true))
    val dirHits = f.select(explode(ancestorPrefixes(col("__fp"))).as("__target"))
      .distinct().withColumn("__is_dir", lit(true))
    val routed = m.join(fileHits, Seq("__target"), "left")
      .join(dirHits, Seq("__target"), "left")
      .withColumn("target_kind",
        when(col("__is_file"), "file")
          .when(col("__is_dir"), "folder")
          .otherwise("missing"))
      .drop("__is_file", "__is_dir")
      .withColumnRenamed("__target", "target_path")
    Errors.tag(routed, col("target_kind") === "missing", Errors.SampleNotFound)
  }

  /** The assembled dropbox flow: bag → row-level required check →
    * SAMPLE_ID resolution → target routing → coercion + omero bags →
    * (ok, errors) channels. */
  def run(meta: DataFrame, files: DataFrame,
          defaultSample: Column): (DataFrame, DataFrame) = {
    val bagged = tagMissingRequired(propertyBag(meta))
    val resolved = withSampleId(bagged, defaultSample)
    val routed = withImageTargets(resolved, files)
    Errors.split(withOmeroBag(withValidationBag(routed)))
  }
}
