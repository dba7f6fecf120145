package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + fixed shard layout — the LAST stage of
  * a training-data pipeline: examples must reach the trainer in a
  * pseudo-random order that is reproducible run-to-run (data-loading
  * resume, ablation comparability), chunked into a fixed number of
  * shards that data-loader workers consume independently.
  *
  * The permutation is [[Similarity.knuthRank]] — a seedable-by-id
  * multiplicative hash, NOT an RNG — so the same corpus always shuffles
  * the same way and any engine can replay the layout (gate: q_shard).
  * shard = rank mod nShards (uniform by construction — no skew, no
  * salting needed), position = dense rank within the shard by (rank,
  * id). Scale shape: one hash-partitioned exchange on `shard` and a
  * per-shard sort — at 100 TB each shard sorts corpus/nShards bytes,
  * sized by choosing nShards, and shards write in parallel via
  * [[writeSharded]]'s partitionBy layout.
  */
object Shards {

  /** (input columns) + (shard, pos): reproducible pseudo-random shard
    * and in-shard position for every row. Ids must satisfy knuthRank's
    * documented range contract (non-negative, < ~3.4e9). */
  def shardShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("__r", Similarity.knuthRank(col(idCol)))
      .withColumn("shard", pmod(col("__r"), lit(nShards)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__r"), col(idCol))).cast("long") - 1)
      .drop("__r")
  }

  /** Materialize the sharded layout: one dir per shard
    * (`shard=<k>/part-*`), rows inside each file in shuffled (pos)
    * order — the layout a data-loader fleet mounts directly. One
    * exchange: repartition BY the shard column (each output dir is
    * written by the tasks owning that shard), in-task sort by pos. */
  def writeSharded(df: DataFrame, idCol: String, nShards: Int,
                   dest: String): Unit =
    shardShuffle(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(dest)
}
