package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join idioms from the reference, named (SURVEY §2.4).
  *
  * Thin by design: each is one declarative join with the right hint, so
  * Catalyst/AQE keep full freedom (broadcast vs shuffle, reorder,
  * runtime skew handling). The value is the contract — which side
  * broadcasts, what counts as a miss — not cleverness.
  */
object Joins {
  /** J4: whitelist membership via broadcast left-semi join
    * (vcf2xml.py:27-47 gene-panel filter). */
  def whitelist(df: DataFrame, panel: DataFrame, keys: Seq[String]): DataFrame =
    df.join(broadcast(panel.select(keys.map(col): _*).distinct()), keys, "left_semi")

  /** J3/SO2 inverse: members with no occurrence (VARIANTABSENT). */
  def absent(all: DataFrame, seen: DataFrame, keys: Seq[String]): DataFrame =
    all.join(seen.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** J5/J6: dictionary lookup join — broadcast dimension, left join,
    * misses flagged (`__miss`) instead of dropped so callers choose
    * inner (reference's `continue`) or error (P7) semantics. */
  def lookup(df: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    // A `__hit` sentinel on the dim side is the miss signal: probing a
    // payload column for NULL would false-positive a legitimately-NULL
    // payload as SAMPLE_NOT_FOUND.
    df.join(broadcast(dim.withColumn("__hit", lit(true))), keys, "left")
      .withColumn("__miss", col("__hit").isNull)
      .drop("__hit")

  /** J10: existence probe — does any row of `existing` match? Keeps
    * `df` rows that have a witness (semi) — the reference's
    * `isCurrentMSRun` membership test (etl_msconvert.py:449-468). */
  def existsIn(df: DataFrame, existing: DataFrame, cond: Column): DataFrame =
    df.join(existing, cond, "left_semi")

  /** J11: join on normalized relative path (metadata row ↔ payload file,
    * etl_msconvert.py:591-633): strip leading ./, collapse //, trim. */
  def normPath(c: Column): Column =
    regexp_replace(regexp_replace(trim(c), "^\\./", ""), "/{2,}", "/")

  def joinOnPath(meta: DataFrame, files: DataFrame,
                 metaPath: String, filePath: String): DataFrame =
    meta.withColumn("__p", normPath(col(metaPath)))
      .join(files.withColumn("__p", normPath(col(filePath))), Seq("__p"))
      .drop("__p")

  /** Interval-containment join as a pure EQUI-join — the binned range
    * join. A naive `t >= start && t < end` join has no equality
    * predicate, so Catalyst plans BroadcastNestedLoopJoin (or worse, a
    * cartesian) — the two shapes that die at corpus scale. Instead both
    * sides map onto fixed-width bins of the point domain: a point lands
    * in its one bin, an interval explodes to every bin it overlaps, the
    * join is a plain shuffle on `__bin`, and the exact containment
    * predicate filters the candidates after. A point meets an interval
    * in EXACTLY the point's own bin, so no dedup pass is needed.
    *
    * Cost scales with bin occupancy × interval span in bins: pick
    * `binWidth` near the typical interval length so each interval
    * explodes to ~2 rows and each candidate list stays bin-local —
    * the standard time-domain co-location trick (same family as the
    * as-of join's range chunking, AsOf.asofJoinChunked).
    *
    * Intervals are [start, end) — empty ones (end <= start) are dropped
    * up front, which also keeps the bin `sequence()` ascending. Column
    * names must be disjoint between the two frames. */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // Integer floor-division, NEVER through double: `x / w` on longs
    // promotes to double, and above 2^53 (raw nanos timestamps are
    // ~1.7e18) the conversion loses low bits — a point near a bin
    // boundary lands in the wrong bin and the pair is silently dropped.
    // (x - pmod(x, w)) is an exact multiple of w with floor semantics
    // for negatives too, so DIV (truncating) equals floor here.
    def binOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    val p = points.withColumn("__bin", binOf(col(pointCol)))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bin", explode(sequence(
        binOf(col(startCol)), binOf(col(endCol) - 1))))
    iv.join(p, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** The ≤1-deletion neighborhood of a string — itself plus every
    * one-character-removed variant (SymSpell's blocking key set, Garbe
    * 2012): two strings are within edit distance 1 iff their
    * neighborhoods intersect, so a dictionary join needs only variant
    * EQUALITY, never a quadratic distance pass. */
  def deleteVariants1(s: Column): Column =
    when(length(s) === 0, array(s)).otherwise(
      array_distinct(concat(array(s), transform(
        sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))))))

  /** Fuzzy dictionary join at edit distance ≤ 1: candidates come ONLY
    * from equal deletion variants (each side explodes |s|+1 keys — the
    * SymSpell tradeoff: linear variant volume buys a pure equi-join;
    * no length-band scan, no all-pairs). Pairs verify with a real
    * `levenshtein` ≤ 1 filter — the neighborhood is complete for d=1
    * (equal / one substitution / one insertion / one deletion all share
    * a variant), so verification only removes d≥2 collisions, never
    * adds. Returns distinct (left, right) value pairs with `dist`. */
  def fuzzyJoin1(left: DataFrame, leftCol: String,
                 right: DataFrame, rightCol: String): DataFrame = {
    val l = left.select(col(leftCol).as("__l"))
      .filter(col("__l").isNotNull).distinct()
      .select(col("__l"), explode(deleteVariants1(col("__l"))).as("__v"))
    val r = right.select(col(rightCol).as("__r"))
      .filter(col("__r").isNotNull).distinct()
      .select(col("__r"), explode(deleteVariants1(col("__r"))).as("__v"))
    l.join(r, "__v")
      .select(col("__l").as(leftCol), col("__r").as(rightCol))
      .distinct()
      .withColumn("dist", levenshtein(col(leftCol), col(rightCol)).cast("long"))
      .filter(col("dist") <= 1)
  }
}
