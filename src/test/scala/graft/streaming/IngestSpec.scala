package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {

  test("streaming AvailableNow ingest matches the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Ingest.groupedCounts(spark, dir, "events.parquet", "event_type")
      .orderBy("event_type")
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .orderBy("event_type")
    assert(rows(streamed) === rows(batch))
  }
}
