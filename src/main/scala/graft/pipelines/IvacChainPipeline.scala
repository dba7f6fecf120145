package graft.pipelines

import graft.operators.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ivac multi-level chain registration
  * (reporting-plugins/register-ivac-lvl/script.py:14-102): one service
  * that creates the canonical openBIS entity chain tier by tier —
  *
  *   lvl 1  Q_EXPERIMENTAL_DESIGN / Q_PROJECT_DETAILS experiments +
  *          Q_BIOLOGICAL_ENTITY sample (no parent, :13-29)
  *   lvl 2  Q_SAMPLE_EXTRACTION experiment + Q_BIOLOGICAL_SAMPLE,
  *          parent = entity (:31-48)
  *   lvl 3  Q_SAMPLE_PREPARATION experiment + Q_TEST_SAMPLE,
  *          parent = biological sample (:50-64)
  *   lvl 4  Q_NGS_MEASUREMENT experiment + Q_NGS_SINGLE_SAMPLE_RUN,
  *          parent = test sample (:66-83)
  *
  * — the one reference service that exercises K2 + the edges table
  * across four tiers at once. The reference loops
  * `tr.createNewSample` per parameter-array index inside one
  * transaction; the engine takes each level as a DataFrame of those
  * parameter rows and composes the SAME catalog state with set
  * operations: experiments/samples append idempotently on code
  * (re-submission creates nothing twice), edges append on
  * (parent, child).
  *
  * Level properties are carried in a `map<string,string>` props column
  * exactly as the reference's setPropertyValue calls populate them
  * (fixed per-level constants like Q_NCBI_ORGANISM=9606 plus the
  * per-row parameters). Level 5 (HLA typing, :85-102) shares the lvl-4
  * shape and is accepted through the same entry by passing it as
  * another tier.
  *
  * Scale: each level's create set is a projection of its parameter
  * frame — no shuffle beyond the appendNew anti-joins, which at 100 TB
  * hash on the (small) key columns only.
  */
object IvacChainPipeline {

  case class ChainResult(samples: DataFrame, experiments: DataFrame,
                         edges: DataFrame)

  /** The level frames carry optional per-row parameter maps; an absent
    * column means "no properties set at this level". */
  private def propsOrEmpty(level: DataFrame)(c: String) =
    if (level.columns.contains(c)) col(c)
    else map().cast("map<string,string>")

  /** One tier's creations: experiments (code, expType, props), samples
    * (code, sampleType, experiment, props), and parent edges. A level
    * frame must carry `exp_code`, `sample_code`, and (levels ≥ 2)
    * `parent`; remaining per-row parameters arrive in `exp_props` /
    * `sample_props` map columns (absent = empty). */
  private def tier(level: DataFrame, expType: String, sampleType: String,
                   withParent: Boolean): (DataFrame, DataFrame, DataFrame) = {
    val props = propsOrEmpty(level) _
    // In-batch dedup on EVERY create set (dropDuplicates on the key, not
    // distinct(): the props column is a MapType, which Spark cannot use
    // as a grouping/equality key): Catalog.appendNew only anti-joins
    // incoming against the EXISTING catalog, so a parameter row repeated
    // within one submission would otherwise append twice — breaking the
    // "re-submission creates nothing twice" idempotency downstream joins
    // rely on.
    val exps = level.select(col("exp_code").as("code"),
      lit(expType).as("expType"), props("exp_props").as("props"))
      .dropDuplicates(Seq("code"))
    val samples = level.select(col("sample_code").as("code"),
      lit(sampleType).as("sampleType"), col("exp_code").as("experiment"),
      props("sample_props").as("props"))
      .dropDuplicates(Seq("code"))
    val edges =
      if (withParent) level.select(col("parent"), col("sample_code").as("child"))
        .dropDuplicates(Seq("parent", "child"))
      else level.limit(0).select(lit("").as("parent"), lit("").as("child"))
    (exps, samples, edges)
  }

  /** Register the full 4-tier chain in one composition. Each `levelN`
    * frame mirrors script.py's per-level parameter arrays (one row per
    * array index); `level1` additionally carries `details_code` +
    * `details_props` for the Q_PROJECT_DETAILS twin experiment. Pass an
    * empty frame for a level the caller doesn't use. */
  def register(existingSamples: DataFrame, existingExperiments: DataFrame,
               existingEdges: DataFrame,
               level1: DataFrame, level2: DataFrame,
               level3: DataFrame, level4: DataFrame): ChainResult = {
    // lvl 1 creates TWO experiments per row: the Q_PROJECT_DETAILS
    // experiment (:19-20) and the Q_EXPERIMENTAL_DESIGN one the entity
    // sample hangs off (:22-29).
    val detailExps = level1.select(col("details_code").as("code"),
      lit("Q_PROJECT_DETAILS").as("expType"),
      propsOrEmpty(level1)("details_props").as("props"))
      .dropDuplicates(Seq("code"))
    val (e1, s1, d1) = tier(level1, "Q_EXPERIMENTAL_DESIGN",
      "Q_BIOLOGICAL_ENTITY", withParent = false)
    val (e2, s2, d2) = tier(level2, "Q_SAMPLE_EXTRACTION",
      "Q_BIOLOGICAL_SAMPLE", withParent = true)
    val (e3, s3, d3) = tier(level3, "Q_SAMPLE_PREPARATION",
      "Q_TEST_SAMPLE", withParent = true)
    val (e4, s4, d4) = tier(level4, "Q_NGS_MEASUREMENT",
      "Q_NGS_SINGLE_SAMPLE_RUN", withParent = true)
    val newExps = detailExps.unionByName(e1).unionByName(e2)
      .unionByName(e3).unionByName(e4)
    val newSamples = s1.unionByName(s2).unionByName(s3).unionByName(s4)
    val newEdges = d1.unionByName(d2).unionByName(d3).unionByName(d4)
    ChainResult(
      Catalog.appendNew(existingSamples, newSamples, Seq("code")),
      Catalog.appendNew(existingExperiments, newExps, Seq("code")),
      Catalog.appendNew(existingEdges, newEdges, Seq("parent", "child")))
  }
}
