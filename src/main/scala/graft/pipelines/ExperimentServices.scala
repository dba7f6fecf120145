package graft.pipelines

import graft.core.Errors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The experiment-side parameter-map services (reporting-plugins) —
  * the last uncovered reference family after the sample-side twins in
  * [[MutationServices]]:
  *
  *  - register-exp/script.py:44-71 — batch experiment creation from
  *    parallel parameter arrays: in-batch duplicate codes are skipped
  *    (first occurrence wins, :61-63), date-shaped property values are
  *    normalized dd-MM-yyyy → 'yyyy-MM-dd HH:mm:ss' (:4-11, 29-33),
  *    and an ENZYMES property allocates the next FREE numbered
  *    `<project>_Proteases<m>` material (bare code first, then 1, 2, …
  *    — a gap-probing while loop, :15-22), stores one Q_PROTEASE_<i>
  *    per enzyme on it, and points the experiment's
  *    Q_PROTEASE_DIGESTION at it (:23-28).
  *  - update-experiment-metadata/script.py:1-18 and
  *    update-single-sample-metadata/script.py:1-18 — per-id property
  *    updates; same core as update-sample-metadata
  *    ([[MutationServices.updatePropsByCode]]).
  *  - update-project-metadata/script.py:1-16 — set a project's
  *    description (getProjectForUpdate on an absent id blows up the
  *    call — kept as a loud require).
  *  - registerUponWorkflow/script.py:14-59 — workflow-trigger
  *    registration: experiment code = prefix + (COUNT of the project's
  *    experiments + 1), plus an MSQC<code> / MSQC<code>T sample pair
  *    on that experiment and a parent edge.
  *
  * Scale posture: every frame here is parameter-batch- or
  * dimension-sized (the catalog key columns), decisions are broadcast
  * lookups, and the one unpartitioned window (in-batch rank for the
  * material numbering) orders a parameter batch, never a corpus.
  */
object ExperimentServices {

  case class ExpBatchResult(experiments: DataFrame, materials: DataFrame,
                            status: DataFrame)

  /** register-exp's date rule (script.py:4-11): a property VALUE that
    * parses as dd-MM-yyyy stores as midnight 'yyyy-MM-dd HH:mm:ss';
    * everything else passes through untouched. try_to_date keeps the
    * probe ANSI-safe (no parse exceptions on arbitrary values). */
  private[pipelines] def normDateValue(v: Column): Column =
    when(try_to_date(v, "dd-MM-yyyy").isNotNull,
      date_format(try_to_date(v, "dd-MM-yyyy"), "yyyy-MM-dd HH:mm:ss"))
      .otherwise(v)

  /** Merge `extra` into a props map, new keys winning (setPropertyValue
    * overwrites) — filtered-concat so a pre-existing key can't throw
    * the duplicate-map-key error. */
  private def putAll(props: Column, extra: Column): Column =
    map_concat(map_filter(coalesce(props, map().cast("map<string,string>")),
      (k, _) => !array_contains(map_keys(extra), k)), extra)

  /** Batch experiment creation (register-exp). `batch` carries
    * (idx, code, expType, props map<string,string>, enzymes
    * array<string> nullable) — idx is the parameter-array position,
    * which is what makes "first occurrence wins" well-defined in a
    * distributed frame. Existing schema: experiments (code, expType,
    * props), materials (code, matType, props).
    *
    * Outcomes as data: `created`, `skipped` (later in-batch duplicate —
    * the reference's silent else-branch at :61-63), or
    * EXPERIMENT_ALREADY_CREATED (the code exists in the catalog; the
    * reference's createNewExperiment would abort the transaction).
    *
    * The Proteases numbering follows the reference's gap-probing while
    * loop: candidate numbers ascend 0 (rendered as the bare code), 1,
    * 2, …; numbers already taken by `existingMaterials` are skipped;
    * surviving batch rows with a non-empty enzymes list take the free
    * numbers in idx order. Everything is dimension-sized: the free-slot
    * frame is |taken| + |needed| rows. */
  def registerExperiments(existingExps: DataFrame,
                          existingMaterials: DataFrame,
                          batch: DataFrame,
                          project: String): ExpBatchResult = {
    val spark = batch.sparkSession
    val dupRank = row_number().over(
      Window.partitionBy(col("code")).orderBy(col("idx")))
    val looked = batch
      .withColumn("__rn", dupRank)
      .join(broadcast(existingExps.select(col("code"))
        .withColumn("__exists", lit(true))), Seq("code"), "left")
    val tagged = looked
      .transform(Errors.tag(_,
        col("__rn") === 1 && col("__exists").isNotNull,
        Errors.ExperimentAlreadyCreated))
    val status = Errors.withErrorChannel(tagged).select(col("code"),
      when(col("__rn") > 1, lit("skipped"))
        .when(size(col("__errors")) > 0, element_at(col("__errors"), 1))
        .otherwise(lit("created")).as("status"))
    val surviving = Errors.split(tagged)._1
      .filter(col("__rn") === 1 && col("__exists").isNull)
      .drop("__rn", "__exists")
      .withColumn("props", transform_values(
        coalesce(col("props"), map().cast("map<string,string>")),
        (_, v) => normDateValue(v)))
    // ------------------------------------------- Proteases numbering
    val prefix = s"${project}_Proteases"
    val taken = existingMaterials
      .filter(col("matType") === "Q_PROTEASE_PROTOCOL")
      .filter(col("code") === prefix ||
        col("code").substr(lit(1), lit(prefix.length)) === prefix)
      .select(when(col("code") === prefix, lit(0L))
        .otherwise(col("code").substr(lit(prefix.length + 1), lit(18))
          .cast("long")).as("n"))
      .filter(col("n").isNotNull)
    val enz = surviving.filter(col("enzymes").isNotNull &&
        size(col("enzymes")) > 0)
      // parameter-batch-sized rank (in-batch order), never corpus-sized
      .withColumn("__rank", row_number().over(Window.orderBy(col("idx"))))
    // two bounded scalars: batch allocation count + highest taken number
    val nNeeded = enz.count()
    val assigned =
      if (nNeeded == 0) enz.withColumn("__mat", lit(null).cast("string"))
      else {
        val maxTaken = taken.agg(coalesce(max(col("n")), lit(-1L)))
          .head().getLong(0)
        val free = spark.range(0, maxTaken + nNeeded + 1).toDF("n")
          .join(broadcast(taken), Seq("n"), "left_anti")
          .withColumn("__rank", row_number().over(Window.orderBy(col("n"))))
          .filter(col("__rank") <= nNeeded)
          .select(col("__rank"), when(col("n") === 0, lit(prefix))
            .otherwise(concat(lit(prefix), col("n"))).as("__mat"))
        enz.join(broadcast(free), Seq("__rank"))
      }
    val newMaterials = assigned.select(col("__mat").as("code"),
      lit("Q_PROTEASE_PROTOCOL").as("matType"),
      map_from_entries(transform(col("enzymes"), (e, i) =>
        struct(concat(lit("Q_PROTEASE_"), (i + 1).cast("string")).as("k"),
          e.as("v")))).as("props"))
    val created = surviving
      .join(broadcast(assigned.select(col("idx"), col("__mat"))),
        Seq("idx"), "left")
      .withColumn("props", when(col("__mat").isNotNull,
        putAll(col("props"), map(lit("Q_PROTEASE_DIGESTION"), col("__mat"))))
        .otherwise(col("props")))
      .select(col("code"), col("expType"), col("props"))
    ExpBatchResult(
      existingExps.unionByName(created),
      existingMaterials.unionByName(newMaterials),
      status)
  }

  /** update-experiment-metadata / update-single-sample-metadata: per-id
    * property updates with the sample twin's exact semantics (new keys
    * win, untouched keys survive, unknown ids statused SAMPLE_NOT_FOUND-
    * style, conflicting in-batch values withheld as AMBIGUOUS_UPDATE). */
  def updateExperimentMetadata(exps: DataFrame,
                               updates: DataFrame): MutationServices.BatchResult =
    MutationServices.updatePropsByCode(exps, updates)

  /** update-project-metadata: set `identifier`'s description. The
    * reference's getProjectForUpdate on an unknown id fails the call —
    * kept loud (a metadata-sized existence probe, not a scan). */
  def updateProjectDescription(projects: DataFrame, identifier: String,
                               description: String): DataFrame = {
    require(!projects.filter(col("code") === identifier).isEmpty,
      s"update-project-metadata: project $identifier not found")
    projects.withColumn("description",
      when(col("code") === identifier, lit(description))
        .otherwise(col("description")))
  }

  case class WorkflowResult(experiments: DataFrame, samples: DataFrame,
                            edges: DataFrame)

  /** registerUponWorkflow: one workflow-trigger registration. The
    * experiment code is prefix + (COUNT of existing experiments + 1) —
    * the reference's numbering (script.py:19-22), kept bug-for-bug:
    * count-based numbers RE-COLLIDE after deletions, unlike the W2
    * max+1 / free-slot rules the dropboxes use (the Scaladoc is the
    * warning). Creates the experiment, the MSQC<code> and MSQC<code>T
    * sample pair on it, and the parent edge — whose parent id the
    * reference builds WITHOUT the MSQC prefix (script.py:50:
    * `"/" + spaceCode + "/" + sampleCode + "T"`), also kept verbatim. */
  def workflowRegistration(existingExps: DataFrame,
                           existingSamples: DataFrame,
                           existingEdges: DataFrame,
                           expCodePrefix: String, expType: String,
                           sampleCode: String, sampleType: String,
                           expProps: Map[String, String] = Map.empty,
                           sampleProps: Map[String, String] = Map.empty): WorkflowResult = {
    import org.apache.spark.sql.functions.{typedlit => tl}
    val spark = existingExps.sparkSession
    import spark.implicits._
    // bounded scalar: the project's experiment count (the reference's
    // len(listExperiments) — a dimension-sized count)
    val n = existingExps.count() + 1
    val expCode = expCodePrefix + n
    val exp = Seq(expCode).toDF("code")
      .withColumn("expType", lit(expType))
      .withColumn("props", tl(expProps).cast("map<string,string>"))
    val samples = Seq("MSQC" + sampleCode, "MSQC" + sampleCode + "T")
      .toDF("code")
      .withColumn("sampleType", lit(sampleType))
      .withColumn("experiment", lit(expCode))
      .withColumn("props", tl(sampleProps).cast("map<string,string>"))
    val edge = Seq((sampleCode + "T", "MSQC" + sampleCode))
      .toDF("parent", "child")
    WorkflowResult(
      graft.operators.Catalog.appendNew(existingExps, exp, Seq("code")),
      graft.operators.Catalog.appendNew(existingSamples, samples, Seq("code")),
      graft.operators.Catalog.appendNew(existingEdges, edge,
        Seq("parent", "child")))
  }
}
