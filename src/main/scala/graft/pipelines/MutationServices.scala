package graft.pipelines

import graft.core.Errors
import graft.operators.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The parameter-map-driven catalog mutation services
  * (reporting-plugins): each takes a batch of per-entity parameter rows
  * and mutates the samples catalog, with the reference's per-entity
  * outcomes surfaced as DATA (a status/error channel), not aborts.
  *
  *  - register-sample-batch/script.py:19-62 — multi-sample create with
  *    already-exists detection: a found code raises
  *    SampleAlreadyExistsError unless "IGNORE EXISTING" was passed, in
  *    which case the row is skipped silently.
  *  - update-sample-metadata/script.py:1-39 — per-id property updates;
  *    unknown ids are logged and skipped.
  *  - set-experiment-for-samples/script.py:1-10 — repoint samples at an
  *    experiment.
  *
  * The engine keeps the reference's per-row semantics but commits
  * partial batches: good rows land, bad rows come back classified
  * (`created` / `skipped` / error code) — at 100 TB one duplicate code
  * must not kill a million-row registration. Every decision is one
  * broadcast lookup against the (dimension-sized) catalog keys; the
  * apply is an upsert-shaped union, no driver loops.
  */
object MutationServices {

  case class BatchResult(samples: DataFrame, status: DataFrame)

  /** register-sample-batch: create each batch row's sample unless its
    * code already exists. `batch` carries (code, sampleType, experiment,
    * props); existing samples share that schema. The status frame
    * classifies every batch row: `created`, `skipped` (exists +
    * ignoreExisting — script.py:60-62's silent else-branch), or
    * `SAMPLE_ALREADY_CREATED` error rows (exists, strict mode — the
    * reference's raise at :62 aborts ALL rows, the engine aborts only
    * the guilty ones); rows naming an experiment absent from
    * `experiments` error as `EXPERIMENT_NOT_FOUND` (the reference's
    * tr.getExperiment would blow up the transaction, :43-44). */
  def registerSampleBatch(existing: DataFrame, experiments: DataFrame,
                          batch: DataFrame,
                          ignoreExisting: Boolean): BatchResult = {
    val looked = batch
      .join(broadcast(existing.select(col("code"))
        .withColumn("__exists", lit(true))), Seq("code"), "left")
      .join(broadcast(experiments.select(col("code").as("experiment"))
        .withColumn("__exp_ok", lit(true))), Seq("experiment"), "left")
      // a code repeated WITHIN the batch has no well-defined winner in a
      // distributed frame (the reference's sequential loop would create
      // the first and blow up on the second); ALL its rows go out the
      // error channel, in both modes — ignoreExisting only forgives
      // collisions with the ALREADY-COMMITTED catalog
      .withColumn("__dup_in_batch",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("code"))) > 1)
    val tagged = looked
      .transform(Errors.tag(_, col("__dup_in_batch"),
        Errors.SampleAlreadyCreated))
      .transform(Errors.tag(_,
        !col("__dup_in_batch") && col("__exists").isNotNull &&
          !lit(ignoreExisting),
        Errors.SampleAlreadyCreated))
      .transform(Errors.tag(_,
        !col("__dup_in_batch") && col("__exists").isNull &&
          col("__exp_ok").isNull,
        Errors.ExperimentNotFound))
    val status = Errors.withErrorChannel(tagged).select(col("code"),
      when(size(col("__errors")) > 0, element_at(col("__errors"), 1))
        .when(col("__exists").isNotNull, lit("skipped"))
        .otherwise(lit("created")).as("status"))
    val (ok, _) = Errors.split(tagged)
    val created = ok.filter(col("__exists").isNull)
      .drop("__exists", "__exp_ok")
      .select(existing.columns.map(col).toSeq: _*)
    BatchResult(existing.unionByName(created), status)
  }

  /** update-sample-metadata: apply per-id property values. `updates`
    * carries (code, prop, value) rows — the flattened form of the
    * reference's per-type {id → value} maps (script.py:31-39). Unknown
    * codes are skipped exactly as the reference logs-and-continues
    * (:28-29); the returned status frame says which. New values win
    * over existing props keys; untouched keys survive (map_concat
    * right-bias via concat order).
    *
    * Duplicates in the batch follow the errors-are-data contract:
    * identical (code, prop, value) rows collapse (a redelivered batch is
    * harmless), but the same (code, prop) with CONFLICTING values has no
    * defined winner in a distributed frame — that code's updates are
    * withheld and statused `AMBIGUOUS_UPDATE` instead of aborting the
    * batch (map_from_entries would otherwise throw on the duplicate key
    * and kill every row). A NULL props map updates like an empty one. */
  def updateSampleMetadata(samples: DataFrame,
                           updates: DataFrame): BatchResult =
    updatePropsByCode(samples, updates)

  /** The props-map update core shared by the sample twin above and the
    * experiment twin ([[ExperimentServices.updateExperimentMetadata]] —
    * update-experiment-metadata / update-single-sample-metadata are the
    * same service over a different entity kind). */
  private[pipelines] def updatePropsByCode(samples: DataFrame,
                                           updates: DataFrame): BatchResult = {
    // ONE aggregation decides everything per code: the pair list for the
    // props merge AND whether any prop repeats with conflicting values
    // (count == countDistinct(prop) after identical dups collapse). No
    // separate conflicted-codes join — a key-join against a filtered
    // twin of a union'd updates frame degenerates branch-wise under
    // constant folding (measured: BroadcastNestedLoopJoin on literal-
    // code branches in the gate plan audit).
    val perCode = updates.dropDuplicates(Seq("code", "prop", "value"))
      .groupBy(col("code"))
      .agg(collect_list(struct(col("prop"), col("value"))).as("__pairs"),
        (count(lit(1)) === count_distinct(col("prop"))).as("__ok"))
    val upd = perCode.filter(col("__ok"))
      .select(col("code"), map_from_entries(col("__pairs")).as("__upd"))
    val emptyProps = map().cast(samples.schema("props").dataType)
    val applied = samples
      .join(broadcast(upd), Seq("code"), "left")
      .withColumn("props",
        when(col("__upd").isNotNull,
          map_concat(map_filter(coalesce(col("props"), emptyProps),
            (k, _) => !array_contains(map_keys(col("__upd")), k)),
            col("__upd")))
          .otherwise(col("props")))
      .drop("__upd")
    val status = Joins.lookup(perCode.select(col("code"), col("__ok")),
      samples.select("code"), Seq("code"))
      .select(col("code"),
        when(col("__miss"), lit(Errors.SampleNotFound))
          .when(!col("__ok"), lit(Errors.AmbiguousUpdate))
          .otherwise(lit("updated")).as("status"))
    BatchResult(applied, status)
  }

  /** set-experiment-for-samples: repoint `ids` at `expCode`. The
    * reference fetches the experiment first (tr.getExperiment, :7) —
    * an absent experiment fails the whole call, kept here as a
    * loud require guarded by a metadata-sized existence probe. */
  def setExperimentForSamples(samples: DataFrame, experiments: DataFrame,
                              ids: Seq[String], expCode: String): DataFrame = {
    require(!experiments.filter(col("code") === expCode).isEmpty,
      s"set-experiment-for-samples: experiment $expCode not found")
    samples.withColumn("experiment",
      when(col("code").isin(ids: _*), lit(expCode))
        .otherwise(col("experiment")))
  }
}
