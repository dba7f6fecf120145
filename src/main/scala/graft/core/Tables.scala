package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LeafNode, Project, SubqueryAlias}

/** Loaders for the star-schema test tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory so the same plan runs at any
  * sf — and, on a real cluster, against partitioned table roots. Reads are
  * plain parquet scans: Catalyst pushes filters and prunes columns into the
  * scan, so callers should never pre-materialize.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** One `spark.read.parquet` per (session, table path) per JVM (r18;
    * guide §1.2/§6 — don't re-do metadata work you already did): every
    * load of the same immutable test table re-listed the directory and
    * re-read parquet footers for schema inference at plan-build time —
    * pure planning overhead, paid by every one of the 250 bench cells.
    * The cached value is the LOGICAL PLAN (relation + file index +
    * schema), not data: every action still scans the parquet input, so
    * results are computed from storage exactly as before. The base
    * tables are immutable for a session's lifetime (the driver contract);
    * anything mutable (fixture dirs, snapshot tables) goes through
    * `spark.read` directly, never through here. */
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    relationCache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))

  /** Parallelism floor for compute-dense scan-stage work (r17; guide
    * §2.2/§6): a single-split input (one parquet row group) pins the scan
    * stage — and every expression fused into it — to ONE task, so a
    * per-row-expensive pass (sha256 shingling, regex parsing, date
    * normalization) serializes on one core regardless of cluster size.
    * When the compiled scan has fewer partitions than the session's
    * default parallelism, spread the raw rows once with a round-robin
    * repartition BEFORE the expensive projection; at production scale the
    * scan already has ≥ cores splits and this is a no-op (the partition
    * count is read from the plan, no job runs).
    *
    * Contract, ENFORCED (r18; advice r17): the partition probe runs only
    * on scan-shaped plans (scan + projections/filters) — on any other
    * shape (a join/aggregate upstream, where `df.rdd` would eagerly
    * materialize AQE shuffle stages at plan-build time) the frame passes
    * through untouched, which is also the right performance answer: a
    * post-shuffle frame already carries the session's shuffle
    * parallelism. Callers must still only use it where every consumer is
    * order-free (aggregation / join / explicitly ordered output) — true
    * of every declared query, which ends in a total order on a unique
    * key. */
  def spread(df: DataFrame): DataFrame = {
    val scanShaped = df.queryExecution.analyzed.collectFirst {
      case p if !(p.isInstanceOf[Project] || p.isInstanceOf[LFilter] ||
        p.isInstanceOf[SubqueryAlias] || p.isInstanceOf[LeafNode]) => p
    }.isEmpty
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (!scanShaped) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
