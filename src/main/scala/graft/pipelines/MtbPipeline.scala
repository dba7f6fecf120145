package graft.pipelines

import graft.core.Errors
import graft.functions.Barcode
import graft.operators.Lineage
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MTB (molecular tumor board) registration compositions.
  *
  * Reference: register-mtb-data-dropbox.py — `getpbmc`/`getallchildren`
  * (:669-724, property-filtered descendant walk: patient → children +
  * grandchildren, keep `Q_PRIMARY_TISSUE = 'PBMC'`, expect exactly one,
  * then take that sample's first child as the Q_TEST_SAMPLE) and
  * `getNextFreeBarcode` (:262-274, letter-rollover barcode counter with a
  * per-candidate existence probe).
  *
  * Distributed form: the walk is the frontier-seeded
  * [[Lineage.descendants]] capped at depth 2, the property filter is one
  * equi-join against the property bag, the 0/>1-found guards are error
  * rows (never aborts), and the free-barcode probe is one anti-join over
  * a bounded candidate range instead of one store roundtrip per try.
  */
object MtbPipeline {
  /** `getNextFreeBarcode`'s counter→code formula, faithful to the Py2
    * integer arithmetic: letter = uppercase[n / 999], number = n % 999
    * zero-filled to 3 digits (so counter 999 rolls to "000B", exactly as
    * the reference computes it), then the checksum char is appended. */
  def nthBarcode(project: Column, n: Column): Column = {
    val letter = char(((n - pmod(n, lit(999))) / lit(999)).cast("long") + lit(65))
    Barcode.make(project, pmod(n, lit(999)), letter)
  }

  /** The next `k` free barcodes for a project, given the codes already in
    * the store: candidates n = startN+1 … startN+|existing|+k (each
    * existing code can block at most one candidate, so the range always
    * holds k free ones — and 26·999 bounds the scheme itself), minus the
    * existing set, in counter order. One range scan + one anti-join —
    * no per-candidate store probe. */
  def nextFreeBarcodes(existing: DataFrame, project: String,
                       startN: Long, k: Int): DataFrame = {
    val spark = existing.sparkSession
    val limit = math.min(existing.count() + k, 26L * 999 - startN)
    val cands = spark.range(startN + 1, startN + 1 + limit)
      .select(col("id").as("n"), nthBarcode(lit(project), col("id")).as("barcode"))
    cands.join(existing.select(col(existing.columns.head).as("barcode")),
        Seq("barcode"), "left_anti")
      .orderBy("n").limit(k)
  }

  /** `getpbmc` for a set of patients at once: walk down ≤2 levels, keep
    * descendants whose `tissueCol` property is 'PBMC', and resolve each
    * PBMC sample's first child (min code — `children[0]` determinism).
    * Guards ride the error channel: `PBMC_NOT_FOUND` ≅ the reference's
    * "Could not find any PBMC sample", `MANY_PBMC` ≅ "More than 1".
    * Output: (start, pbmc, test_sample, n_pbmc, __errors). */
  def pbmcTestSamples(edges: DataFrame, props: DataFrame,
                      patients: DataFrame, tissueCol: String): DataFrame = {
    val hits = Lineage.descendants(edges, patients)
      .filter(col("depth") <= 2)
      .join(props.select(col("node").as("descendant"), col(tissueCol)),
        Seq("descendant"))
      .filter(col(tissueCol) === "PBMC")
      .select(col("start"), col("descendant").as("pbmc"))
      .distinct()
    val firstChild = edges.groupBy(col("parent").as("pbmc"))
      .agg(min(col("child")).as("test_sample"))
    val perStart = hits.join(firstChild, Seq("pbmc"), "left")
      .groupBy("start")
      .agg(count(lit(1)).as("n_pbmc"),
        min(col("pbmc")).as("pbmc"),
        min(col("test_sample")).as("test_sample"))
    val all = patients.select(col(patients.columns.head).as("start")).distinct()
      .join(perStart, Seq("start"), "left")
      .withColumn("n_pbmc", coalesce(col("n_pbmc"), lit(0L)))
    Errors.tag(Errors.tag(all, col("n_pbmc") === 0, "PBMC_NOT_FOUND"),
      col("n_pbmc") > 1, "MANY_PBMC")
  }
}
