package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diffing — the row-level regression report between two runs
  * of the same pipeline (yesterday's publish vs today's): which keys
  * were added, removed, or changed. At 100 TB the trick is that the
  * full-outer join never carries the rows themselves: each side is
  * projected to (key, 32-byte fingerprint) in its scan stage, so the
  * shuffle volume is keys + a constant, independent of row width. Two
  * co-bucketed snapshots (the q_bucketjoin layout) diff with no
  * exchange at all.
  */
object Snapshot {
  /** sha256 fingerprint over `cols` in the given order. Null-safe: each
    * column encodes as `0` (null) or `1`+value, fields joined with
    * `\u0001` — a null never collides with any string value. (A value
    * containing `\u0001` could straddle fields; acceptable for the
    * fingerprint's regression-report purpose and documented here.)
    * Callers pick engine-portable renderings for the compared columns
    * (integral/string, not raw doubles) when the diff must replay
    * cross-engine. */
  def rowFingerprint(cols: Seq[Column]): Column =
    sha2(concat_ws("\u0001", cols.map(c =>
      when(c.isNull, lit("0")).otherwise(concat(lit("1"), c.cast("string")))): _*),
      256)

  /** Row diff of `after` vs `before` on `keyCols`, comparing
    * `compareCols` (name → expression over that side's row): one
    * full-outer join of the two (key, fingerprint) projections,
    * classification `added` / `removed` / `changed` (unchanged rows are
    * dropped). Keys must be unique per side — the join would otherwise
    * fan out; violations surface as duplicate keys in the report. */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
           compareCols: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(compareCols.nonEmpty, "need at least one compared column")
    def side(d: DataFrame, fp: String) =
      d.select(keyCols.map(col) :+ rowFingerprint(compareCols).as(fp): _*)
    side(before, "__fp_b")
      .join(side(after, "__fp_a"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__fp_b").isNull, "added")
          .when(col("__fp_a").isNull, "removed")
          .when(col("__fp_b") =!= col("__fp_a"), "changed")
          .otherwise("same"))
      .filter(col("change") =!= "same")
      .select(keyCols.map(col) :+ col("change"): _*)
  }
}
