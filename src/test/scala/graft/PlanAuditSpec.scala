package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape guardrails over EVERY declared query: the properties that
  * keep a plan viable at 100× — no cartesian products, no accidental
  * BroadcastNestedLoopJoin (only the intentional 1-row-query cross joins
  * of the ANN operators are exempt), and column pruning reaching the
  * parquet scans — asserted on the optimized plans at sf0.001, so a
  * regression fails `sbt test` before any bench run sees it. */
class PlanAuditSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // crossJoin(broadcast(one-row query vector)) is the intended shape for
  // the ANN queries. q_embdup_exact needs NO exemption since round 7: its
  // stratum-bounded blocked all-pairs is a pure equi-join.
  // q_mmr and q_rrf's semantic arm join the corpus against the (tiny,
  // broadcast) multi-query frame with no equi-key — every corpus row
  // scores against every query, the intended relevance fan-out, same
  // family as the 1-row ANN cross joins. (A deployment feeds rrfFuse
  // from bm25TopN/ivfKnnIndexed instead; the gate arm is deliberately
  // the oracle-expressible brute form.)
  private val nestedLoopExempt = Set("q_knn", "q_knn_ivf", "q_knn_int8",
    "q_mmr", "q_rrf", "q_jlknn",
    // the exact re-rank stage scores a driver-small shortlist against
    // the 1-row query — the same intended ANN fan-out as q_knn
    "q_knn_ivfrr")
  // Streaming queries execute on construction and return memory-table
  // reads; their batch plan is not the interesting surface.
  private val streaming = Set("q_stream", "q_windows", "q_sessions", "q_upsert",
    "q_stream_dedup", "q_stream_enrich", "q_stream_join", "q_stream_funnel",
    "q_stream_outer", "q_stream_full", "q_stream_semi", "q_stream_swindow",
    "q_stream_scd2", "q_stream_joinagg", "q_stream_debounce",
    "q_tws_sessions")

  test("no declared query plans a cartesian or unintended nested-loop join") {
    val offenders = Queries.all.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => streaming.contains(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution
          .explainString(ExplainMode.fromString("extended"))
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
          !nestedLoopExempt.contains(name)
        if (cartesian || bnlj) Some(name) else None
      }
    assert(offenders.isEmpty,
      s"queries with cartesian/nested-loop plans: $offenders")
  }

  test("column pruning reaches the documents scan (no read-everything scans)") {
    val plan = Queries.all("q_fingerprint")(spark, dir)
      .queryExecution.executedPlan.toString
    val read = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    val cols = read.split(",").map(_.trim.takeWhile(_ != ':')).toSet
    assert(cols.nonEmpty && cols.subsetOf(Set("doc_id", "text")),
      s"q_fingerprint should scan only (doc_id, text), got: $cols\n$plan")
  }

  test("q_bucketjoin's DECLARED plan consumes bucket layout: no shuffle below the join") {
    // BucketedJoinSpec proves the property for hand-built tables; this
    // asserts it on the declared query's own plan. Broadcast is disabled
    // so the small gate tables can't dodge the question, and AQE is
    // disabled so the physical tree is inspectable (node collection —
    // the aggregate ABOVE the join legitimately shuffles, so the
    // assertion must scope to the join subtree, not the plan string).
    val conf = spark.conf
    val savedB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedA = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Queries.all("q_bucketjoin")(spark, dir)
      val smj = df.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, "declared q_bucketjoin should sort-merge-join")
      val subtree = smj.head.toString
      assert(!subtree.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$subtree")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedB)
      conf.set("spark.sql.adaptive.enabled", savedA)
    }
  }

  test("q_lookup pushes its key predicate into the scan") {
    val plan = Queries.all("q_lookup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("c_custkey"),
      s"expected c_custkey filter pushed to parquet:\n$plan")
  }

  test("q_topk's DECLARED plan uses the heap operator, not a window sort") {
    val plan = Queries.all("q_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"),
      s"RewriteTopKWindow must fire on the declared query:\n$plan")
    assert(!plan.contains("Window"),
      s"no window (and its partition-wide sort) should remain:\n$plan")
  }
}
