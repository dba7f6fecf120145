package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) multi-dimensional layout: interleave the bits
  * of two query dimensions so that a 2-D box predicate maps to a SMALL
  * set of coarse curve buckets — the storage-layout answer to "we
  * always filter on (customer, date) together" that one-column
  * partitioning can't give. At 100 TB this is the difference between
  * reading a handful of directories and scanning every day-partition
  * for one customer range (Morton 1966; the technique behind
  * Delta/Iceberg Z-ORDER clustering).
  *
  * Everything here is pure integer div/mod/multiply — no bit intrinsics
  * — so the DuckDB gate replays the exact curve arithmetic, and the
  * bucket set a driver plans with is the same set any engine derives.
  *
  * Layout contract: [[writeZOrdered]] publishes directory-partitioned by
  * the coarse bucket (dir count bounded by 4^gridBits, never by data
  * size) and z-sorted WITHIN each bucket, so directory pruning handles
  * the coarse cut and parquet row-group min/max stats cluster for the
  * fine cut. Readers filter `zb IN bucketsForBox(...)` plus the exact
  * box — the bucket set is a strict superset of the box, so the box
  * predicate stays required and the layout can never change results,
  * only the bytes read.
  */
object Layout {
  /** Interleave the low `bits` bits of two non-negative coords: bit i
    * of `a` lands at position 2i, of `b` at 2i+1. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31; got $bits")
    (0 until bits).map { i =>
      val p = 1L << i
      ((a / p).cast("long") % 2) * lit(1L << (2 * i)) +
        ((b / p).cast("long") % 2) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Driver-side scalar twin of [[zValue]] for planning bucket sets. */
  def zValueScalar(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Coarse z-bucket: the Morton code of the top `gridBits` bits of each
    * coord — i.e. which cell of the 2^gridBits × 2^gridBits grid the row
    * falls in, numbered along the curve. */
  def zBucket(a: Column, b: Column, bits: Int, gridBits: Int): Column = {
    require(gridBits >= 1 && gridBits <= bits,
      s"need 1 <= gridBits <= bits; got $gridBits/$bits")
    val cell = 1L << (bits - gridBits)
    zValue((a / cell).cast("long"), (b / cell).cast("long"), gridBits)
  }

  /** Every z-bucket the box [aLo,aHi] × [bLo,bHi] intersects: enumerate
    * the overlapped grid cells (driver-side, ≤ 4^gridBits — a planning
    * constant, never data-sized) and Morton-code them. Sorted, distinct. */
  def bucketsForBox(aLo: Long, aHi: Long, bLo: Long, bHi: Long,
                    bits: Int, gridBits: Int): Seq[Long] = {
    require(0 <= aLo && aLo <= aHi && 0 <= bLo && bLo <= bHi,
      s"need a well-formed non-negative box; got [$aLo,$aHi]x[$bLo,$bHi]")
    val cell = 1L << (bits - gridBits)
    (for {
      ca <- (aLo / cell) to (aHi / cell)
      cb <- (bLo / cell) to (bHi / cell)
    } yield zValueScalar(ca, cb, gridBits)).distinct.sorted
  }

  /** Publish `df` z-ordered on (aCol, bCol): one directory per coarse
    * bucket (`partitionBy(zb)`), rows z-sorted inside each task's file
    * so row-group stats cluster. One shuffle (by bucket) then a
    * partition-local sort — no global sort ever. */
  def writeZOrdered(df: DataFrame, aCol: Column, bCol: Column,
                    bits: Int, gridBits: Int, path: String): Unit =
    df.withColumn("zb", zBucket(aCol, bCol, bits, gridBits))
      .withColumn("__z", zValue(aCol, bCol, bits))
      .repartition(col("zb"))
      .sortWithinPartitions("zb", "__z")
      .drop("__z")
      .write.mode("overwrite").partitionBy("zb").parquet(path)

  /** Small-file compaction — the OPTIMIZE maintenance pass every
    * long-lived dataset needs: streaming ingest and fine-grained
    * partition writes leave thousands of KB-scale files whose per-file
    * open/footer/task overhead dominates scans long before data volume
    * does. Reads the fragmented dataset and rewrites it as
    * ⌈totalBytes/targetBytes⌉ files via `coalesce` — a NARROW
    * dependency (partitions merge in place, NO shuffle: content is
    * only moved between workers at read time, never re-exchanged),
    * which is what makes compaction affordable to run continuously at
    * 100 TB. Returns (input file count, output file count planned).
    * Content-preserving by construction — the gate reads the compacted
    * copy while the oracle reads the ORIGINAL, so any row the rewrite
    * mangles diverges the hash (the q_orc pattern).
    *
    * Deliberately single-directory: partitioned layouts compact per
    * partition dir (drive this per-partition), which also keeps each
    * run's blast radius bounded and idempotent-rerunnable. */
  def compactFiles(spark: SparkSession, inDir: String, outDir: String,
                   targetBytes: Long): (Int, Int) = {
    require(targetBytes >= 1, s"need targetBytes >= 1; got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    require(files.nonEmpty, s"no parquet files under $inDir")
    val total = files.map(_.getLen).sum
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(n)
      .write.mode("overwrite").parquet(outDir)
    (files.length, n)
  }

  /** The [[zBucket]] arithmetic as ANSI SQL text (div = `//`, mod = `%`)
    * for oracle replay — the same expression tree [[zValue]] builds,
    * rendered over column names. */
  def zBucketSql(a: String, b: String, bits: Int, gridBits: Int): String = {
    val cell = 1L << (bits - gridBits)
    (0 until gridBits).map { i =>
      val p = 1L << i
      s"((($a // $cell) // $p) % 2) * ${1L << (2 * i)} + " +
        s"((($b // $cell) // $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
  }
}
