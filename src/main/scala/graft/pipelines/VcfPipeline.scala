package graft.pipelines

import graft.functions.AminoAcid
import graft.operators.Joins
import graft.sources.{Parsers, Sinks}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant-analysis pipeline (extractPGMdata.py + vcf2xml.py +
  * register-iontorrent-data.py): VCF parse (S6) → significance filter
  * (P4) → sheet↔VCF equi-join with REF/ALT agreement (J1) → ANN
  * allele match + explode (J2) → gene-panel whitelist (J4) →
  * absent-gene anti-join (J3) → TSV export (K8).
  */
object VcfPipeline {
  /** P4: SNP ∧ heterozygous-band frequency filter
    * (extractPGMdata.py:28 semantics over a freq column in percent). */
  def significant(variants: DataFrame): DataFrame =
    variants.filter(col("info_map")("TYPE") === "snp" &&
      ((col("freq") > 5 && col("freq") < 35) || (col("freq") > 65 && col("freq") < 85)))

  /** J1/J2: probe sheet rows against VCF by (chrom, pos); REF must agree,
    * sheet ALT must be among the VCF ALTs; matching ANN entries explode
    * into one row per annotation whose allele equals the ALT. */
  def sheetVariantJoin(sheet: DataFrame, vcf: DataFrame): DataFrame =
    sheet.join(vcf, Seq("chrom", "pos"))
      .filter(col("sheet_ref") === col("ref") &&
        array_contains(split(col("alt"), ","), col("sheet_alt")))
      .select(col("chrom"), col("pos"), col("sheet_alt"),
        explode(col("ann")).as("a"))
      .filter(col("a.allele") === col("sheet_alt"))
      .select(col("chrom"), col("pos"), col("a.gene").as("gene"),
        col("a.hgvs_c").as("dna_change"),
        AminoAcid.normalizeProteinChange(col("a.hgvs_p")).as("aa_change"))
      .dropDuplicates("gene", "dna_change", "aa_change") // A9

  /** J3: analyzed genes with no detected variant → VARIANTABSENT rows. */
  def absentGenes(analyzed: DataFrame, detected: DataFrame): DataFrame =
    Joins.absent(analyzed, detected, Seq("gene"))
      .withColumn("status", lit("VARIANTABSENT"))

  /** End-to-end: VCF file + sheet + panel → (detected, absent), exported. */
  def run(spark: SparkSession, vcfPath: String, sheet: DataFrame,
          panel: DataFrame, outDir: String): (DataFrame, DataFrame) = {
    val vcf = Parsers.readVcf(spark, vcfPath)
    val detected = Joins.whitelist(sheetVariantJoin(sheet, vcf), panel, Seq("gene"))
    val absent = absentGenes(panel, detected)
    Sinks.writeTsv(detected, s"$outDir/detected", singleFile = true)
    Sinks.writeTsv(absent, s"$outDir/absent", singleFile = true)
    (detected, absent)
  }
}
