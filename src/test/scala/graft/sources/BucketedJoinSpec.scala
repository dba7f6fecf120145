package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB claim behind q_bucketjoin, asserted as a plan property:
  * two tables published `bucketBy(8, key).sortBy(key)` join WITHOUT any
  * Exchange (shuffle) — the join consumes the bucket layout. Broadcast
  * is disabled for the assertion so the small test tables can't dodge
  * the question by broadcasting.
  */
class BucketedJoinSpec extends SparkSpec {

  private val work = java.nio.file.Files
    .createTempDirectory("graft_bucket_spec_").toString

  private def publish(name: String, src: String, key: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.read.parquet(s"/root/testdata/sf0.001/$src.parquet")
      .write.format("parquet").bucketBy(8, key).sortBy(key)
      .option("path", s"$work/$name").mode("overwrite").saveAsTable(name)
  }

  test("bucketed+sorted tables sort-merge-join with zero Exchange") {
    publish("bk_orders", "orders", "o_orderkey")
    publish("bk_lineitem", "lineitem", "l_orderkey")
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bk_orders")
        .join(spark.table("bk_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it returns the same rows as the plain parquet join
      val direct = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
        .join(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() === direct.count())
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucket pruning reaches the scan for a point predicate") {
    publish("bk_orders2", "orders", "o_orderkey")
    // autoBucketedScan downgrades a filter-only scan to a plain one
    // (no interchange benefit), which also forfeits bucket pruning —
    // pin it on so the pruning path is what's under test.
    val conf = spark.conf
    val saved = conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val df = spark.table("bk_orders2").filter(col("o_orderkey") === 7L)
      val plan = df.queryExecution.executedPlan.toString
      // Bucketed scans report how many buckets survive pruning.
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected 1-of-8 bucket pruning for a point lookup:\n$plan")
      assert(df.count() >= 0)
    } finally conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", saved)
  }
}
