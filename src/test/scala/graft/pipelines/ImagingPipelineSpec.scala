package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files => JFiles}

class ImagingPipelineSpec extends SparkSpec {
  import spark.implicits._

  // A metadata_table.tsv the way register-omero.py receives one: dynamic
  // columns, mixed-case header with spaces, '*' placeholders, int/float/
  // string values, and one row whose required property is a placeholder.
  private lazy val tsvDir: String = {
    val d = JFiles.createTempDirectory("graft-imaging")
    JFiles.writeString(d.resolve("metadata_table.tsv"),
      "Filename\tImage Data Path\tImaging Modality\tImaged Tissue\tInstrument Manufacturer\tInstrument User\tImaging Date\tExposure Ms\tPixel Size\n" +
        "f1.tif\t./run1/f1.tif\tCT\tliver tissue\tZeiss\tuser1\t2024-01-01\t150\t0.45\n" +
        "f2.tif\t./run1\tMRI\tkidney\tZeiss\tuser2\t2024-01-02\t200\t1.5e-2\n" +
        "f3.tif\t./missing/f3.tif\t*\tliver\tZeiss\tuser3\t2024-01-03\t*\t2\n")
    d.toString
  }

  private lazy val files =
    Seq("run1/f1.tif", "run1/f2.tif", "other/f9.tif").toDF("path")

  test("readMetadataTable normalizes the dynamic header") {
    val meta = ImagingPipeline.readMetadataTable(spark, tsvDir)
    assert(meta.columns.toSeq === Seq("FILENAME", "IMAGE_DATA_PATH",
      "IMAGING_MODALITY", "IMAGED_TISSUE", "INSTRUMENT_MANUFACTURER",
      "INSTRUMENT_USER", "IMAGING_DATE", "EXPOSURE_MS", "PIXEL_SIZE"))
    assert(ImagingPipeline.missingRequired(meta).isEmpty)
    assert(ImagingPipeline.missingRequired(
      meta.drop("IMAGING_DATE")) === Seq("IMAGING_DATE"))
  }

  test("propertyBag drops placeholders and underscores values") {
    val meta = ImagingPipeline.readMetadataTable(spark, tsvDir)
    val bags = ImagingPipeline.propertyBag(meta)
      .select(col("FILENAME"), col("props")).as[(String, Map[String, String])]
      .collect().toMap
    assert(bags("f1.tif")("IMAGED_TISSUE") === "liver_tissue")
    assert(!bags("f3.tif").contains("IMAGING_MODALITY")) // '*' dropped
    assert(!bags("f3.tif").contains("EXPOSURE_MS"))
    assert(bags("f2.tif")("IMAGE_DATA_PATH") === "./run1")
  }

  test("coercion probes type int/float/string exactly once each") {
    val meta = ImagingPipeline.readMetadataTable(spark, tsvDir)
    val v = ImagingPipeline.withValidationBag(ImagingPipeline.propertyBag(meta))
      .filter(col("FILENAME") === "f2.tif")
      .select(explode(col("vprops")).as(Seq("k", "tv")))
      .select(col("k"), col("tv.kind"), col("tv.int_val"),
        col("tv.float_val"), col("tv.str_val"))
      .as[(String, String, Option[Long], Option[Double], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(v("exposure_ms") === (("int", Some(200L), None, None)))
    assert(v("pixel_size") === (("float", None, Some(1.5e-2), None)))
    assert(v("imaging_modality") === (("string", None, None, Some("MRI"))))
  }

  test("image targets route file vs folder vs missing; run() splits channels") {
    val meta = ImagingPipeline.readMetadataTable(spark, tsvDir)
    val (ok, errs) = ImagingPipeline.run(meta, files, lit("QDEFAULT99"))
    val kinds = ok.select(col("FILENAME"), col("target_kind"))
      .as[(String, String)].collect().toMap
    assert(kinds === Map("f1.tif" -> "file", "f2.tif" -> "folder"))
    // f3: required placeholder + missing target → both codes accumulated.
    val errRows = errs.select(col("FILENAME"), col("__errors"))
      .as[(String, Seq[String])].collect().toMap
    assert(errRows.keySet === Set("f3.tif"))
    assert(errRows("f3.tif").toSet ===
      Set(graft.core.Errors.MetadataFormatting, graft.core.Errors.SampleNotFound))
    // omero bag drops the blacklist; validation bag lowercases keys.
    val row = ok.filter(col("FILENAME") === "f1.tif")
      .select(col("omero_props"), col("sample_code"), col("project_code"))
      .as[(Map[String, String], String, String)].collect().head
    assert(!row._1.contains("IMAGE_DATA_PATH") && row._1.contains("IMAGING_MODALITY"))
    assert(row._2 === "QDEFAULT99" && row._3 === "QDEFA")
  }

  test("a 10-char SAMPLE_ID property overrides the dropbox default") {
    val meta = ImagingPipeline.normalizeHeader(
      Seq(("f1.tif", "QABCD001A0"), ("f2.tif", "short"))
        .toDF("Filename", "Sample Id"))
    val out = ImagingPipeline.withSampleId(
        ImagingPipeline.propertyBag(meta), lit("QDEFAULT99"))
      .select(col("FILENAME"), col("sample_code"), col("project_code"))
      .as[(String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("f1.tif") === (("QABCD001A0", "QABCD")))
    assert(out("f2.tif") === (("QDEFAULT99", "QDEFA")))
  }
}
