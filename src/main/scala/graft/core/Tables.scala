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
}
