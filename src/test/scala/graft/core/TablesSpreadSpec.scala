package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Tables.spread]]'s enforced contract (r18; advice r17): the
  * parallelism floor fires only on scan-shaped plans; any frame with an
  * exchange-bearing node upstream (join, aggregate, repartition) passes
  * through UNTOUCHED — the probe must never eagerly materialize AQE
  * shuffle stages at plan-build time. */
class TablesSpreadSpec extends SparkSpec {
  import spark.implicits._

  private def tmpParquet(): String = {
    val d = java.nio.file.Files.createTempDirectory("spread_spec").toString
    // coalesce(1): a single file/split, so the scan sits below
    // defaultParallelism and the floor has something to do
    (1 to 100).map(i => (i.toLong, s"row $i")).toDF("id", "t")
      .coalesce(1).write.mode("overwrite").parquet(d)
    d
  }

  test("scan-shaped frame below the floor is spread to defaultParallelism") {
    val df = spark.read.parquet(tmpParquet())
      .select(col("id"), upper(col("t")).as("t"))
      .filter(col("id") > 0)
    val out = Tables.spread(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // same rows either way
    assert(out.count() == 100)
  }

  test("non-scan-shaped frames pass through unchanged (no probe, no repartition)") {
    val p = tmpParquet()
    val base = spark.read.parquet(p)
    val joined = base.join(base.select(col("id")), Seq("id"))
    val agged = base.groupBy(col("t")).agg(count(lit(1)).as("n"))
    for (df <- Seq(joined, agged)) {
      val out = Tables.spread(df)
      // pass-through: the SAME plan object semantics — no added
      // RoundRobinPartitioning anywhere in the analyzed plan
      assert(out.queryExecution.analyzed == df.queryExecution.analyzed)
    }
  }

  test("scan already at or above the floor is left alone") {
    val d = java.nio.file.Files.createTempDirectory("spread_spec_wide").toString
    (1 to 100).map(i => (i.toLong, s"row $i")).toDF("id", "t")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(d)
    val df = spark.read.parquet(d)
    val out = Tables.spread(df)
    assert(out.queryExecution.analyzed == df.queryExecution.analyzed)
  }
}
