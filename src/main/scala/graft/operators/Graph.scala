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

  /** Per-node triangle counts of an undirected graph given as canonical
    * edges `(x, y)` with x < y, distinct. The join is DEGREE-ORIENTED
    * (Latapy 2008 / the MapReduce standard): every edge points from its
    * lower-(degree, id) endpoint to the higher, wedges pair a node's
    * out-neighbors, and a wedge closes iff its two tips are a canonical
    * edge. Out-degrees are bounded by O(√m) on ANY degree sequence, so
    * wedge volume is O(m^1.5) — a power-law hub with degree d generates
    * C(d,2) wedges under id-orientation but only O(m) under degree
    * orientation; this is what keeps the self-join alive at a 10⁹-edge
    * graph. All three joins are equi-joins (no BNLJ anywhere); the
    * oracle states the naive id-ordered 3-way join — a different plan
    * over the same truth, so the orientation logic itself is gated. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("x"), col("y")).persist()
    try {
      val deg = e.select(col("x").as("n")).unionAll(e.select(col("y").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      // orient by (degree, id): src = smaller endpoint in that order
      val withDeg = e
        .join(deg.select(col("n").as("x"), col("d").as("dx")), "x")
        .join(deg.select(col("n").as("y"), col("d").as("dy")), "y")
      val oriented = withDeg.select(
        when(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")), col("x"))
          .otherwise(col("y")).as("src"),
        when(col("dx") < col("dy") ||
          (col("dx") === col("dy") && col("x") < col("y")), col("y"))
          .otherwise(col("x")).as("dst"))
      // wedges: unordered pairs of out-neighbors of one src
      val o1 = oriented.as("o1")
      val o2 = oriented.as("o2")
      val wedges = o1.join(o2,
          col("o1.src") === col("o2.src") && col("o1.dst") < col("o2.dst"))
        .select(col("o1.src").as("w"),
          col("o1.dst").as("u"), col("o2.dst").as("v"))
      // closure: the tip pair is a canonical edge (tips are id-ordered
      // by the o1.dst < o2.dst wedge order only if ids; order them)
      val tri = wedges.join(e,
        least(col("u"), col("v")) === col("x") &&
          greatest(col("u"), col("v")) === col("y"))
        .select(col("w"), col("u"), col("v"))
      tri.select(explode(array(col("w"), col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
        // eager: the caller's presentation runs after unpersist
        .localCheckpoint()
    } finally { e.unpersist(); () }
  }
}
