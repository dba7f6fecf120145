package graft.operators

import graft.core.Checkpoints
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-alignment operators (SURVEY §2.6 W1/W3, §2.4 J12).
  *
  * The reference pairs `sorted(xls)` with `sorted(vcf)` positionally
  * (register-iontorrent-data.py:371-372) and matches raw↔mzML files by
  * shared stem (register-raw-and-mzml.py). Distributed form: rank each
  * side with `row_number` and equi-join on the rank — one shuffle per
  * side, no driver sort.
  */
object Align {
  /** Global 1-based rank by `order` WITHOUT a single-task window: the
    * zipWithIndex idiom, columnar. Range-repartition by the key, sort
    * within partitions, pin the layout, then
    * rank = (rows in earlier partitions) + in-partition ordinal.
    * The ordinal is `mid - min(mid within partition)`, which relies only
    * on `monotonically_increasing_id` being dense within a partition
    * (each task counts rows up from its own base) — NOT on the id's
    * internal pid<<33 bit layout, which Spark documents as "current
    * implementation" only. Per-partition (count, min-id) pairs are one
    * tiny collect (numPartitions rows) off the pinned scan.
    * Every stage is balanced across partitions — nothing funnels the
    * table through one core, at any scale.
    *
    * The pinned checkpoint blocks live until the returned frame is GC'd
    * (the ContextCleaner reclaims them); callers running many ranks in
    * one JVM should drop references or clear the cache between runs.
    *
    * Ties in `order` may land in either of two adjacent range
    * partitions, so their relative rank is engine-arbitrary — the same
    * caveat as `row_number` over a non-unique key on any engine. */
  def withGlobalRank(df: DataFrame, order: Column,
                     rankCol: String = "__rn"): DataFrame = {
    val numParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = Checkpoints.pin(df.repartitionByRange(numParts, order)
      .sortWithinPartitions(order)) // pin partitions: stats + ordinals read one layout
    val tagged = parted
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
    val stats = tagged.groupBy("__pid")
      .agg(count(lit(1)).as("cnt"), min(col("__mid")).as("mn"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val maxPid = if (stats.isEmpty) 0 else stats.keys.max
    val offsets = (0 to maxPid).scanLeft(0L) { (acc, pid) =>
      acc + stats.get(pid).map(_._1).getOrElse(0L)
    }
    val offsetByPid = offsets.zipWithIndex.map { case (o, pid) => pid -> o }.toMap
    val minByPid = stats.map { case (pid, (_, mn)) => pid -> mn }
    tagged
      .withColumn(rankCol,
        element_at(typedLit(offsetByPid), col("__pid")) +
          (col("__mid") - element_at(typedLit(minByPid), col("__pid"))) + 1L)
      .drop("__pid", "__mid")
  }

  /** W1: positional pairing of two frames under their own sort orders.
    * Row i of `left` (by `leftOrder`) joins row i of `right` (by
    * `rightOrder`); unequal lengths keep only the common prefix. */
  def alignSorted(left: DataFrame, right: DataFrame,
                  leftOrder: Column, rightOrder: Column): DataFrame = {
    val l = withGlobalRank(left, leftOrder, "__rn")
    val r = withGlobalRank(right, rightOrder, "__rn")
    l.join(r, "__rn").drop("__rn")
  }

  /** J12: group files by stem (path minus final extension); `paths` is
    * the sorted member list, `complete` marks the expected pair size. */
  def pairByStem(files: DataFrame, pathCol: String,
                 expected: Int = 2): DataFrame =
    files.groupBy(
        regexp_replace(col(pathCol), "\\.[^./]+$", "").as("stem"))
      .agg(sort_array(collect_list(col(pathCol))).as("paths"),
        count(lit(1)).as("n"))
      .withColumn("complete", col("n") === expected)

  /** W3: latest row by a sortable column (most-recent variantCaller run,
    * register-iontorrent-data.py:237-242). */
  def latest(df: DataFrame, by: Column): DataFrame =
    df.orderBy(by.desc).limit(1)
}
