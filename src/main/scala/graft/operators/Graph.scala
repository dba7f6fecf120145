package graft.operators

import graft.core.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the web-corpus curation signal (a page's
  * PageRank is the classic crawl-frontier / quality prior, and the same
  * iteration ranks entities in any derived graph: citation, lineage,
  * co-purchase).
  *
  * Fixed-point INTEGER PageRank: ranks are BIGINTs scaled by `scale`,
  * the damping step is exact integer arithmetic
  * (pr' = (scale·(den−num)) div den + (num·Σ contrib) div den, contrib
  * = pr div out-degree), so a fixed iteration count yields bit-identical
  * ranks on any engine — the same engine-portability discipline as
  * [[Stats.temperatureMix]] (no float accumulation, no pow/exp). The
  * float-free form is not an approximation of "real" PageRank so much
  * as a rounding CHOICE: each division floors once per node per
  * iteration, an error bounded by iters·den/scale — with the default
  * scale 10⁶ that is parts-per-thousand after 3 iterations.
  *
  * Multigraph semantics: parallel edges contribute (and count toward
  * out-degree) once per edge. Dangling nodes (no out-edges) keep
  * receiving the teleport base but their mass is dropped, the common
  * simplification for bounded-iteration runs; callers who need mass
  * conservation add explicit self-loops.
  *
  * Scale shape: the edge list is hash-partitioned by src ONCE and
  * persisted (`iterate` reuses it every round); an iteration is one
  * join of ranks onto edges (both sides partitioned by the same key)
  * plus one partial-aggregated groupBy(dst) — shuffle volume is
  * O(edges) per iteration, never quadratic, and plan lineage is
  * truncated through [[Checkpoints.pin]] every round so 30 iterations
  * cost the same per-round as 3.
  */
object Graph {
  /** (node, pr) after `iters` rounds over the directed multigraph
    * `edges(srcCol, dstCol)`. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, scale: Long = 1000000L,
               dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && scale > 0 && dampNum > 0 && dampDen > dampNum,
      s"need iters>=1, scale>0, 0<dampNum<dampDen; got $iters/$scale/$dampNum/$dampDen")
    val e = edges.select(col(srcCol).cast("string").as("src"),
      col(dstCol).cast("string").as("dst"))
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    try {
      val outDeg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("out"))
      val base = (scale * (dampDen - dampNum)) / dampDen
      var pr = nodes.withColumn("pr", lit(scale))
      for (_ <- 1 to iters) {
        val contrib = pr.join(outDeg, Seq("node"))
          .select(col("node"), expr("pr div out").as("c"))
        val inSum = e.join(contrib, e("src") === contrib("node"))
          .groupBy(col("dst")).agg(sum("c").as("s"))
          .withColumnRenamed("dst", "node")
        pr = Checkpoints.pin(
          nodes.join(inSum, Seq("node"), "left")
            .select(col("node"),
              (lit(base) +
                expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
                .as("pr")))
      }
      // safe to release: pin() has eagerly materialized the final ranks
      pr
    } finally { e.unpersist(); nodes.unpersist() }
  }
}
