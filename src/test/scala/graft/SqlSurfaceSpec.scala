package graft

import org.apache.spark.sql.execution.ExplainMode

/** The spark.sql subquery surface (q_tpch4/17/22): beyond the
  * hash-gated row values, each query exists to exercise a specific
  * piece of Catalyst subquery planning — so assert the rewrite
  * actually happened. A regression that leaves a subquery unplanned
  * (or planned as a nested loop) should fail here, not surface as a
  * bench cliff.
  */
class SqlSurfaceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def physical(name: String): String =
    Queries.all(name)(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q_tpch4: EXISTS rewrites to a LEFT SEMI join (no residual subquery)") {
    val p = physical("q_tpch4")
    assert(p.contains("LeftSemi"), s"expected LeftSemi in:\n$p")
    assert(!p.contains("InSubquery") && !p.contains("exists#"),
      s"subquery survived planning:\n$p")
  }

  test("q_tpch17: correlated scalar subquery decorrelates to an aggregate join") {
    val p = physical("q_tpch17")
    // Decorrelation = per-partkey aggregate joined back; the physical
    // plan must contain a join against an aggregated lineitem arm and
    // no scalar-subquery execution node.
    assert(!p.contains("Subquery "), s"scalar subquery survived planning:\n$p")
    assert(p.contains("HashAggregate"), p)
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(p).size
    assert(joins >= 2, s"expected outer join + decorrelated agg join:\n$p")
  }

  test("q_tpch22: NOT EXISTS plans as a LEFT ANTI join") {
    val p = physical("q_tpch22")
    assert(p.contains("LeftAnti"), s"expected LeftAnti in:\n$p")
  }

  test("q_lateral: correlated LIMIT subquery decorrelates (no lateral-loop exec)") {
    val p = physical("q_lateral")
    // the rewrite target is a ranked join (window or aggregated arm) —
    // the must-not is a per-outer-row subquery execution node
    assert(!p.contains("LateralJoin") && !p.contains("Subquery "),
      s"lateral subquery survived planning:\n$p")
    assert(p.contains("Join"), p)
  }

  test("q_tpch20: nested correlated scalars inside IN fully decorrelate") {
    val p = physical("q_tpch20")
    assert(!p.contains("Subquery "), s"scalar subquery survived planning:\n$p")
    assert(p.contains("LeftSemi"), s"IN must plan as semi join:\n$p")
  }

  test("q_tpch2: correlated scalar MIN decorrelates to an aggregate join") {
    val p = physical("q_tpch2")
    assert(!p.contains("Subquery "), s"scalar subquery survived planning:\n$p")
    assert(p.contains("HashAggregate"), p)
    val joins = "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(p).size
    assert(joins >= 3, s"expected part+supplier joins + decorrelated min join:\n$p")
  }

  test("q_tpch16: NOT IN blacklist plans as a LEFT ANTI join") {
    val p = physical("q_tpch16")
    assert(p.contains("LeftAnti"), s"expected LeftAnti in:\n$p")
  }

  test("q_tpch21: EXISTS + NOT EXISTS plan as LeftSemi + LeftAnti in one query") {
    val p = physical("q_tpch21")
    assert(p.contains("LeftSemi"), s"expected LeftSemi in:\n$p")
    assert(p.contains("LeftAnti"), s"expected LeftAnti in:\n$p")
  }

  test("q_tpch19: the OR-of-ANDs predicate factors out the equi-join key") {
    // BooleanSimplification must extract the common `p_partkey =
    // l_partkey` conjunct from the three disjuncts — the plan is an
    // equi hash/merge join with the brand/size/qty disjunction as a
    // residual, never a nested loop over the fact table.
    val p = physical("q_tpch19")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
           !p.contains("CartesianProduct"),
      s"disjunctive join degenerated to a nested loop:\n$p")
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
             .findAllIn(p).nonEmpty, s"expected an equi join in:\n$p")
  }

  test("q_tpch13: the extra non-key predicate stays on the LEFT OUTER join") {
    val p = physical("q_tpch13")
    assert(p.contains("LeftOuter"), s"expected LeftOuter in:\n$p")
  }

  test("SQL rank()/dense_rank() ≤ k plan as TopKPerKey (no WindowExec)") {
    // the rewrite must fire from the pure-SQL face too, not just the
    // DataFrame API — same Filter-over-Window logical shape either way
    for (fn <- Seq("rank", "dense_rank", "row_number")) {
      val df = spark.sql(
        s"""SELECT * FROM (
           |  SELECT l_orderkey, l_extendedprice,
           |         $fn() OVER (PARTITION BY l_returnflag
           |                     ORDER BY l_extendedprice) AS r
           |  FROM parquet.`$dir/lineitem.parquet`) WHERE r <= 5""".stripMargin)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKey"), s"$fn did not rewrite:\n$p")
      assert(!p.contains("Window"), s"$fn left a Window node:\n$p")
    }
  }

  test("q_tpch1: one scan, partial+final hash aggregate, no join") {
    val p = physical("q_tpch1")
    assert(p.contains("HashAggregate"), p)
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|NestedLoop)".r
      .findAllIn(p).hasNext, s"Q1 must be join-free:\n$p")
    // six aggregates off ONE lineitem scan (details section lists each
    // scan node once as "(n) Scan parquet"; the tree repeats the name)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1, p)
  }

  test("q_tpch3: join funnel ends in a TopK, not a global sort") {
    val p = physical("q_tpch3")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected ORDER BY+LIMIT to plan as TopK:\n$p")
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(p).size >= 2, s"expected the 3-relation funnel:\n$p")
  }

  test("q_tpch6: every predicate reaches the parquet scan") {
    val p = physical("q_tpch6")
    assert(!"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(p).hasNext, s"Q6 must be join-free:\n$p")
    // the shipdate range must be PUSHED (scan-level skipping at scale);
    // the discount/quantity arithmetic evaluates post-scan but inside
    // the same codegen stage
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"expected shipdate pushed to the scan:\n$p")
  }

  test("q_tpch9: the 5-relation star plans as an equi-join chain") {
    val p = physical("q_tpch9")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(p).size >= 4, s"expected 4 joins over 5 relations:\n$p")
  }

  test("q_tpch10: grouped revenue TopK 20 plans as TakeOrdered") {
    val p = physical("q_tpch10")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(p).size >= 3, s"expected the 4-relation funnel:\n$p")
  }

  test("q_tpch14: both conditional aggregates share one join and scan") {
    val p = physical("q_tpch14")
    assert("""\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)""".r
      .findAllIn(p).size == 1, s"expected exactly one part join:\n$p")
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 2, // lineitem + part
      s"the CASE pair must not duplicate scans:\n$p")
  }

  test("the six completing TPC-H rows are non-degenerate") {
    for (name <- Seq("q_tpch1", "q_tpch3", "q_tpch6", "q_tpch9",
        "q_tpch10", "q_tpch14")) {
      val out = Queries.all(name)(spark, dir).collect()
      assert(out.nonEmpty, s"$name returned no rows")
    }
  }

  test("the three subquery rows return plausible non-degenerate results") {
    val q4 = Queries.all("q_tpch4")(spark, dir).collect()
    assert(q4.nonEmpty && q4.forall(_.getLong(1) > 0))
    val q17 = Queries.all("q_tpch17")(spark, dir).collect()
    assert(q17.nonEmpty && q17.forall(_.getLong(1) > 0))
    val q22 = Queries.all("q_tpch22")(spark, dir).collect()
    assert(q22.nonEmpty && q22.forall(_.getLong(1) > 0))
  }
}
