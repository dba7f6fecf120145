package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB state posture: the default HDFS-backed state store keeps
  * every key's state on the executor HEAP — a continuous sessionize or
  * dedup over a large key space eventually OOMs on memory, not data.
  * RocksDB spills state to local disk with bounded memory; this spec
  * proves every stateful operator in the engine runs unchanged (and
  * answers identically) on the RocksDB provider, so flipping ONE conf is
  * the whole migration. */
class RocksDbStateSpec extends SparkSpec {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Key = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val saved = spark.conf.getOption(Key)
    spark.conf.set(Key, Provider)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  test("windowed aggregation answers identically on the RocksDB provider") {
    val dir = "/root/testdata/sf0.001"
    val heap = rows(Ingest.windowedCounts(spark, dir, "events.parquet",
      "event_type").orderBy("wstart", "event_type"))
    val rocks = withRocksDb {
      rows(Ingest.windowedCounts(spark, dir, "events.parquet",
        "event_type").orderBy("wstart", "event_type"))
    }
    assert(rocks === heap)
    assert(heap.nonEmpty)
  }

  test("stateful sessionization answers identically on the RocksDB provider") {
    val dir = "/root/testdata/sf0.001"
    val gap = 30L * 60 * 1000000000L
    val heap = rows(Sessionize.userSessions(spark, dir, "events.parquet", gap)
      .orderBy("user_id"))
    val rocks = withRocksDb {
      rows(Sessionize.userSessions(spark, dir, "events.parquet", gap)
        .orderBy("user_id"))
    }
    assert(rocks === heap)
  }

  test("streaming dedup answers identically on the RocksDB provider") {
    val dir = "/root/testdata/sf0.001"
    val heap = rows(Ingest.dedupStream(spark, dir, "events.parquet",
      Seq("user_id", "event_type")).orderBy("user_id", "event_type"))
    val rocks = withRocksDb {
      rows(Ingest.dedupStream(spark, dir, "events.parquet",
        Seq("user_id", "event_type")).orderBy("user_id", "event_type"))
    }
    assert(rocks === heap)
  }
}
