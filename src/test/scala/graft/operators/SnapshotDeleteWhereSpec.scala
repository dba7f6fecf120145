package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Predicate-level MoR DELETE (Snapshot.deleteSnapshotMoRWhere):
  * current-state semantics (the predicate sees the resolved upsert
  * log), stats-pruned key scan (pinned by corrupting a file outside
  * the predicate's bounds — a pruned scan never opens it), zero base
  * rewrites, no-match no-op, and the predicateBounds fold itself.
  */
class SnapshotDeleteWhereSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(pfx: String) =
    java.nio.file.Files.createTempDirectory(pfx).toString

  test("deleteWhere evaluates against the RESOLVED current state") {
    val dest = tmp("graft-dw")
    Snapshot.publishSnapshot(
      Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("k", "x"),
      dest, statsCol = Some("k"))
    // upsert moves k=2 OUT of the doomed range and k=3 INTO it
    Snapshot.mergeSnapshotMoR(
      Seq((2L, 99L), (3L, 25L)).toDF("k", "x"), dest, "k")
    val v = Snapshot.deleteSnapshotMoRWhere(spark, dest, "k",
      col("x") >= 20L && col("x") <= 40L)
    assert(v == 3)
    // k=2's latest value (99) is spared; k=3's latest (25) and k=4 die
    assert(rows(Snapshot.readSnapshot(spark, dest, v).orderBy("k")) ===
      Seq(Seq(1L, 10L), Seq(2L, 99L)))
    // no base file was rewritten: only tombstone lines were added
    val l2 = Snapshot.manifestLines(spark, dest, 2).toSet
    val l3 = Snapshot.manifestLines(spark, dest, 3)
    assert(l2.subsetOf(l3.toSet))
    assert(l3.filterNot(l2).forall(_.startsWith("!")))
  }

  test("stats pruning: files outside the predicate bounds are never opened") {
    val dest = tmp("graft-dwp")
    // 4 range files of 25 keys each over 0..99, stats on k
    Snapshot.publishSnapshot(
      (0L until 100L).map(k => (k, s"v$k")).toDF("k", "v")
        .repartitionByRange(4, col("k")),
      dest, statsCol = Some("k"))
    // corrupt the LAST file (covers k ∈ [75, 99]) on disk: a scan that
    // opens it fails, so a green deleteWhere PROVES the pruning
    val m1 = Snapshot.manifestLines(spark, dest, 1)
    val lastRel = m1.map(_.split("\t")).maxBy(_(2).toLong).head
    val p = java.nio.file.Paths.get(s"$dest/$lastRel")
    val saved = java.nio.file.Files.readAllBytes(p)
    java.nio.file.Files.write(p, "garbage".getBytes)
    val v = Snapshot.deleteSnapshotMoRWhere(spark, dest, "k",
      col("k") >= 10L && col("k") < 20L && col("v").isNotNull)
    java.nio.file.Files.write(p, saved)
    assert(v == 2)
    assert(Snapshot.readSnapshot(spark, dest, 2).count() == 90)
    assert(rows(Snapshot.readSnapshot(spark, dest, 2)
      .filter(col("k") < 25L).orderBy("k")).map(_.head) ===
      ((0L until 10L) ++ (20L until 25L)))
  }

  test("no-match predicate returns the current version without tombstoning") {
    val dest = tmp("graft-dwn")
    Snapshot.publishSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      dest, statsCol = Some("k"))
    val v = Snapshot.deleteSnapshotMoRWhere(spark, dest, "k",
      col("k") > 100L)
    assert(v == 1)
    // still a clean copy-on-write table: appends keep working
    Snapshot.appendSnapshot(Seq((3L, "c")).toDF("k", "v"), dest)
    assert(Snapshot.readSnapshot(spark, dest, 2).count() == 3)
  }

  test("updateWhere: current-state predicate, self-referencing SET, O(matches) commit") {
    val dest = tmp("graft-uw")
    Snapshot.publishSnapshot(
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d"))
        .toDF("k", "x", "v"),
      dest, statsCol = Some("k"))
    // upsert moves k=2 out of the match set and k=3 stays in
    Snapshot.mergeSnapshotMoR(
      Seq((2L, 99L, "B")).toDF("k", "x", "v"), dest, "k")
    val v = Snapshot.updateSnapshotMoRWhere(spark, dest, "k",
      col("x") >= 20L && col("x") <= 40L,
      Map("x" -> (col("x") + 1000L), "v" -> concat(col("v"), lit("_u"))))
    assert(v == 3)
    assert(rows(Snapshot.readSnapshot(spark, dest, v).orderBy("k")) ===
      Seq(Seq(1L, 10L, "a"), Seq(2L, 99L, "B"),
        Seq(3L, 1030L, "c_u"), Seq(4L, 1040L, "d_u")))
    // zero base rewrites: v2's lines are a subset of v3's
    val l2 = Snapshot.manifestLines(spark, dest, 2).toSet
    assert(l2.subsetOf(Snapshot.manifestLines(spark, dest, 3).toSet))
    // chained predicate ops compose: delete what update just tagged
    val v2 = Snapshot.deleteSnapshotMoRWhere(spark, dest, "k",
      col("v").endsWith("_u"))
    assert(rows(Snapshot.readSnapshot(spark, dest, v2).orderBy("k")) ===
      Seq(Seq(1L, 10L, "a"), Seq(2L, 99L, "B")))
  }

  test("updateWhere: SET may add a new column; key SET and no-match guarded") {
    val dest = tmp("graft-uw2")
    Snapshot.publishSnapshot(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dest, statsCol = Some("k"))
    intercept[IllegalArgumentException] {
      Snapshot.updateSnapshotMoRWhere(spark, dest, "k",
        col("k") === 1L, Map("k" -> (col("k") + 10L)))
    }
    // no match: version unchanged, table stays clean copy-on-write
    assert(Snapshot.updateSnapshotMoRWhere(spark, dest, "k",
      col("k") > 100L, Map("v" -> lit("x"))) == 1)
    Snapshot.appendSnapshot(Seq((3L, "c")).toDF("k", "v"), dest)
    // add-column evolution through the update
    val v = Snapshot.updateSnapshotMoRWhere(spark, dest, "k",
      col("k") === 2L, Map("flag" -> lit("hot")))
    val out = Snapshot.readSnapshot(spark, dest, v).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(out === Seq((1L, "a", null), (2L, "b", "hot"), (3L, "c", null)))
  }

  test("predicateBounds folds conjuncts soundly") {
    import org.apache.spark.sql.catalyst.expressions.Expression
    def b(c: org.apache.spark.sql.Column): (Long, Long) = {
      val probe = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType))))
      probe.filter(c).queryExecution.analyzed match {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          Snapshot.predicateBounds(f.condition, "k")
        case _ => fail("no filter node")
      }
    }
    val MinL = Long.MinValue; val MaxL = Long.MaxValue
    assert(b(col("k") >= 5L && col("k") <= 9L) === (5L, 9L))
    assert(b(col("k").between(5, 9)) === (5L, 9L)) // Int literals widen
    assert(b(col("k") === 7L) === (7L, 7L))
    assert(b(lit(3L) <= col("k")) === (3L, MaxL))
    assert(b(col("k") > 5L) === (5L, MaxL)) // strict kept inclusive
    assert(b(col("k").isin(4L, 8L, 6L)) === (4L, 8L))
    // a branch without k-bounds un-bounds the Or
    assert(b(col("k") >= 5L || col("v") === "x") === (MinL, MaxL))
    // Or of two bounded branches unions
    assert(b(col("k") < 3L || col("k") > 90L) === (MinL, MaxL))
    assert(b((col("k") >= 1L && col("k") <= 3L) ||
      (col("k") >= 8L && col("k") <= 9L)) === (1L, 9L))
    // null-matching and negated shapes never tighten
    assert(b(col("k").isNull) === (MinL, MaxL))
    assert(b(!(col("k") > 5L)) === (MinL, MaxL))
    // foreign-column conjuncts tighten through the And
    assert(b(col("k") >= 5L && col("v") === "x") === (5L, MaxL))
  }
}
