package graft.pipelines

import graft.core.Errors
import graft.operators.Catalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The parameterized wf-* workflow-result family (SURVEY §7 step 10 —
  * register-wf-mapping/register-mapping-dropbox.py:40-84 is the
  * template): incoming folder names carry the full target identity
  * `SPACE_PROJECT_EXPNAME_SAMPLECODE`; the pipeline splits the name
  * (F2), updates the sample's workflow-status property (K2 upsert) and
  * registers result + log datasets (K1).
  */
object WfPipeline {
  /** F2: name → (space, project, experiment, sample) columns. Names with
    * fewer than 4 segments flow out the error channel. */
  def parseName(incoming: DataFrame, nameCol: String): DataFrame = {
    val segs = split(col(nameCol), "_")
    val parsed = incoming
      .withColumn("space", get(segs, lit(0)))
      .withColumn("project", get(segs, lit(1)))
      .withColumn("experiment", get(segs, lit(2)))
      .withColumn("sample", get(segs, lit(3)))
    Errors.tag(parsed, col("sample").isNull, Errors.MetadataFormatting)
  }

  /** K2: set the workflow status property on the target samples. */
  def updateStatus(samples: DataFrame, targets: DataFrame,
                   status: String): DataFrame = {
    val updates = targets.select(col("sample").as("code"))
      .distinct()
      .join(samples, Seq("code"), "left_semi")
      .join(samples, Seq("code"))
      .withColumn("props",
        map_concat(
          graft.functions.MapOps.dropKeys(col("props"), Seq("wf_status")),
          map(lit("wf_status"), lit(status))))
    Catalog.upsert(samples, updates, Seq("code"))
  }

  /** K1: one result + one log dataset per parsed folder. */
  def resultDatasets(parsed: DataFrame): DataFrame = {
    val ok = parsed.filter(size(col("__errors")) === 0)
    ok.select(concat(col("sample"), lit("_result")).as("code"),
        lit("WF_RESULT").as("dsType"), col("sample"), col("path"))
      .unionByName(
        ok.select(concat(col("sample"), lit("_log")).as("code"),
          lit("WF_LOG").as("dsType"), col("sample"), col("path")))
  }
}
