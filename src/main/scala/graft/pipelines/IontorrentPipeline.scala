package graft.pipelines

import graft.operators.Joins
import graft.sources.Sinks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iontorrent variant-export composition
  * (register-iontorrent-data.py:495-518).
  *
  * The reference walks significant variants writing `gene \t aaChange`
  * lines, deleting each written gene from the analyzed-genes dict, then
  * emits `gene \t VARIANTABSENT` for every gene left — i.e. detected
  * rows UNION an anti-join of analyzed genes against detected ones.
  * Spark form: one union of two declarative branches ([[Joins.absent]]
  * is the dict-delete loop), exported as a single named TSV through
  * [[Sinks.writeTsvFile]] — no driver-side line loop, any number of
  * patients in one pass.
  */
object IontorrentPipeline {
  /** Export rows: (gene, change) for detected variants, (gene,
    * VARIANTABSENT) for analyzed-but-clean genes. `significant` needs
    * (gene, aa_change); `analyzedGenes` needs (gene). */
  def variantExportRows(significant: DataFrame,
                        analyzedGenes: DataFrame): DataFrame = {
    val detected = significant.select(col("gene"), col("aa_change").as("change"))
    val absent = Joins.absent(analyzedGenes.select("gene"), significant, Seq("gene"))
      .select(col("gene"), lit("VARIANTABSENT").as("change"))
    detected.unionByName(absent)
  }

  /** `<patient>-<sample>-variants.tsv` (:504) at `dir`, single file, no
    * header — the reference's raw two-column export format. */
  def export(significant: DataFrame, analyzedGenes: DataFrame,
             dir: String, patientId: String, sampleId: String): String = {
    val path = s"$dir/$patientId-$sampleId-variants.tsv"
    Sinks.writeTsvFile(variantExportRows(significant, analyzedGenes), path,
      header = false)
    path
  }
}
