package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
    * Contract: call it on scan-shaped frames only (scan + projections/
    * filters — no joins or aggregates upstream, or the partition probe
    * itself can trigger AQE stage materialization), and only where every
    * consumer is order-free (aggregation / join / explicitly ordered
    * output) — true of every declared query, which ends in a total order
    * on a unique key. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
