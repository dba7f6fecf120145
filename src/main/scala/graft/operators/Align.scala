package graft.operators

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
    * The ordinal comes from `monotonically_increasing_id`'s documented
    * (partitionId << 33 | recordNumber) layout over the pinned scan;
    * per-partition row counts are one tiny collect (numPartitions rows).
    * Every stage is balanced across partitions — nothing funnels the
    * table through one core, at any scale.
    *
    * Ties in `order` may land in either of two adjacent range
    * partitions, so their relative rank is engine-arbitrary — the same
    * caveat as `row_number` over a non-unique key on any engine. */
  def withGlobalRank(df: DataFrame, order: Column,
                     rankCol: String = "__rn"): DataFrame = {
    val numParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(numParts, order)
      .sortWithinPartitions(order)
      .localCheckpoint() // pin partitions: counts + ordinals read one layout
    val tagged = parted
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ord",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
    val counts = tagged.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (counts.isEmpty) 0 else counts.keys.max
    val offsets = (0 to maxPid).scanLeft(0L) { (acc, pid) =>
      acc + counts.getOrElse(pid, 0L)
    }
    val offsetByPid = offsets.zipWithIndex.map { case (o, pid) => pid -> o }.toMap
    tagged
      .withColumn(rankCol,
        element_at(typedLit(offsetByPid), col("__pid")) + col("__ord") + 1L)
      .drop("__pid", "__ord")
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
