package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IMGAG parent-resolution composition (register-imgag.py:140-220).
  *
  * The reference resolves, for every (barcode, geneticID) request pair,
  * the NGS-run parent sample it should attach results to — by an O(n²)
  * nested scan over `foundSamples` with a compound per-row predicate:
  *
  *   test sample := (code == barcode AND type == Q_TEST_SAMPLE)
  *               OR (parents ∋ /space/barcode AND analyte == wanted
  *                   AND shortID ∈ {secondaryName, externalID})   (:159)
  *   run sample  := parents ∋ testSample AND type == Q_NGS_SINGLE_SAMPLE_RUN
  *               AND geneticID ∈ {secondaryName, externalID}      (:168)
  *
  * Spark form (the §4 "one join with compound predicate" collapse): the
  * OR is decomposed into two EQUI-join branches (direct-code hit;
  * parent-edge hit with the analyte/short-id filter) unioned, then one
  * more equi-join through the edge table finds the run sample — no
  * nested loop, no BNLJ, linear in |samples| at any scale.
  *
  * Inputs: `requests(barcode, genetic_id)`;
  * `samples(code, identifier, sample_type, analyte, sec_name, ext_id)`;
  * `edges(child_identifier, parent_identifier)`.
  */
object ImgagPipeline {
  /** (barcode, genetic_id, test_parent) — the test-sample resolution. */
  def resolveTestParents(requests: DataFrame, samples: DataFrame,
                         edges: DataFrame, space: String): DataFrame = {
    val req = requests.withColumn("gen_short_id",
      element_at(split(col("genetic_id"), "_"), 1))
    // Branch A (:159 lhs): the barcode IS a test sample's code.
    val direct = req.join(samples,
        req("barcode") === samples("code") &&
          samples("sample_type") === "Q_TEST_SAMPLE")
      .select(req("barcode"), col("genetic_id"),
        samples("identifier").as("test_parent"))
    // Branch B (:159 rhs): a sample whose PARENT is /space/barcode, with
    // the wanted analyte and the genetics short id in either name field.
    val viaParent = req
      .join(edges, concat(lit(s"/$space/"), req("barcode")) ===
        edges("parent_identifier"))
      .join(samples, edges("child_identifier") === samples("identifier") &&
        (samples("sec_name").contains(req("gen_short_id")) ||
          samples("ext_id").contains(req("gen_short_id"))))
      .select(req("barcode"), col("genetic_id"),
        samples("identifier").as("test_parent"))
    direct.unionByName(viaParent).dropDuplicates("genetic_id", "test_parent")
  }

  /** Full resolution: (barcode, genetic_id, test_parent, run_parent) —
    * the NGS single-sample run attached to the resolved test sample
    * carrying the genetic id (:168-176). `samples` here must already be
    * filtered to the wanted analyte for branch B's semantics, as the
    * reference's typesDict[expType] check does. */
  def resolveParents(requests: DataFrame, samples: DataFrame,
                     edges: DataFrame, space: String): DataFrame = {
    val tests = resolveTestParents(requests, samples, edges, space)
    val runs = samples.filter(col("sample_type") === "Q_NGS_SINGLE_SAMPLE_RUN")
      .select(col("identifier").as("run_identifier"),
        col("sec_name").as("run_sec_name"), col("ext_id").as("run_ext_id"))
    // Fresh column names for the second edge hop — `edges` already
    // appears inside `tests`' lineage (branch B), so reusing its
    // attributes here would be an ambiguous self-join.
    val hop = edges.select(col("child_identifier").as("run_child"),
      col("parent_identifier").as("run_parent_of"))
    tests
      .join(hop, col("test_parent") === col("run_parent_of"))
      .join(runs, col("run_child") === col("run_identifier") &&
        (col("run_sec_name").contains(col("genetic_id")) ||
          col("run_ext_id").contains(col("genetic_id"))))
      .select(col("barcode"), col("genetic_id"), col("test_parent"),
        col("run_identifier").as("run_parent"))
  }

  /** The reference's completeness guard (:220
    * `len(testParentIdentifiers) != len(geneticIDS)`): requests whose
    * resolution found NO run parent — non-empty result means the batch
    * must not register. */
  def unresolved(requests: DataFrame, resolved: DataFrame): DataFrame =
    requests.join(resolved.select("genetic_id"), Seq("genetic_id"), "left_anti")
}
