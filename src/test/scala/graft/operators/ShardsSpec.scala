package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc$i")).toDF("id", "body")

  test("shard assignment and position are deterministic run-to-run") {
    val a = Shards.shardShuffle(docs(200), "id", 8)
      .orderBy("id").collect().toSeq
    val b = Shards.shardShuffle(docs(200).repartition(13), "id", 8)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("positions are dense 0..n_s-1 within every shard") {
    val r = Shards.shardShuffle(docs(500), "id", 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(r.length === 8)
    for (row <- r) {
      assert(row.getLong(2) === 0L)
      assert(row.getLong(3) === row.getLong(1) - 1)
    }
  }

  test("shards are near-uniform (multiplicative hash, no skew)") {
    val sizes = Shards.shardShuffle(docs(1600), "id", 16)
      .groupBy("shard").count().select("count").as[Long].collect()
    assert(sizes.length === 16)
    // each shard expects 100; the Knuth hash keeps them within a loose band
    assert(sizes.min > 50 && sizes.max < 200, s"skewed shards: ${sizes.toSeq}")
  }

  test("in-shard order is the hash order, not the id order") {
    val r = Shards.shardShuffle(docs(100), "id", 1)
      .orderBy("pos").select("id").as[Long].collect().toSeq
    assert(r !== r.sorted) // shuffled
    assert(r.sorted === (0L until 100L)) // but a permutation
  }

  test("writeSharded materializes one dir per shard in pos order") {
    val dest = java.nio.file.Files.createTempDirectory("graft_shard").toString + "/out"
    Shards.writeSharded(docs(120), "id", 4, dest)
    val dirs = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.toSeq === Seq("shard=0", "shard=1", "shard=2", "shard=3"))
    val back = spark.read.parquet(dest)
    assert(back.count() === 120)
    // within one shard file, rows are stored in pos order
    val s0 = spark.read.parquet(s"$dest/shard=0").select("pos").as[Long]
      .collect().toSeq
    assert(s0 === s0.sorted)
  }
}
