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
    * `edges(srcCol, dstCol)`. Node ids keep the caller's column type —
    * callers with numeric ids shuffle 8-byte longs per round instead of
    * decorated strings (guide §2.3 "narrower types"; r17). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, scale: Long = 1000000L,
               dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && scale > 0 && dampNum > 0 && dampDen > dampNum,
      s"need iters>=1, scale>0, 0<dampNum<dampDen; got $iters/$scale/$dampNum/$dampDen")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    // declared outside the try so the finally can release it — an
    // exception mid-iteration must not leak the largest cached frame
    // (advice r17)
    var ew: DataFrame = null
    try {
      // Out-degree is folded onto the edge list ONCE (r17: it used to be
      // joined onto the ranks EVERY round): per-edge `pr div out` is the
      // same integer the per-node contrib computed, and the fold drops a
      // nodes×nodes join (plus its exchange pair) from every iteration.
      // `ew` inherits e's hash(src) layout, the ranks come back from each
      // round's pin partitioned by node, and the renamed `dst → node`
      // aggregate keeps its hash layout through the alias — so one round
      // costs exactly ONE edge-sized exchange (the groupBy(dst)).
      ew = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("out")),
        Seq("src")).persist()
      val base = (scale * (dampDen - dampNum)) / dampDen
      var pr = nodes.withColumn("pr", lit(scale))
      for (_ <- 1 to iters) {
        val inSum = ew.join(pr, ew("src") === pr("node"))
          .select(col("dst"), expr("pr div out").as("c"))
          .groupBy(col("dst")).agg(sum("c").as("s"))
          .withColumnRenamed("dst", "node")
        pr = Checkpoints.pin(
          nodes.join(inSum, Seq("node"), "left")
            .select(col("node"),
              (lit(base) +
                expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
                .as("pr")))
      }
      // safe to release in the finally: pin() has eagerly materialized
      // the final ranks before the loop exits
      pr
    } finally {
      e.unpersist(); nodes.unpersist()
      if (ew != null) { ew.unpersist(); () }
    }
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

  /** Synchronous label propagation (Raghavan et al. 2007) over the
    * undirected multigraph `edges(srcCol, dstCol)`: every node starts
    * with its own id as label; each round it adopts the most frequent
    * label among its neighbors' PREVIOUS labels (ties → smallest
    * label; parallel edges collapse to one vote per neighbor). A fixed
    * iteration count with the deterministic tie-break makes the result
    * bit-identical on any engine — no random update order, no float
    * scores — so community detection itself can carry a hash gate.
    * Isolated update order is the textbook synchronous variant; the
    * known 2-cycle oscillation on bipartite structures is a property
    * of that variant, not a bug, and a fixed `iters` simply reports
    * the labelling after round k.
    *
    * Scale shape: the adjacency is symmetrized, de-duplicated and
    * hash-partitioned by the join key ONCE and persisted; one round =
    * one equi-join of labels onto adjacency + one partial-aggregated
    * (node, label) count + one argmin-struct fold — shuffle volume
    * O(edges) per round, never quadratic, and plan lineage is cut via
    * [[Checkpoints.pin]] every round. Nodes with no neighbors keep
    * their label through the left join. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1; got $iters")
    // repartition BEFORE distinct (r17): hash(nbr) clusters (node, nbr),
    // so the dedup aggregate reuses the layout the per-round join needs —
    // ONE edge-sized exchange builds the adjacency instead of two.
    val adj = edges.select(col(srcCol).as("node"), col(dstCol).as("nbr"))
      .unionAll(edges.select(col(dstCol).as("node"),
        col(srcCol).as("nbr")))
      .repartition(col("nbr")) // the per-round join key: nbr → its label
      .distinct() // one vote per (node, neighbor) even on parallel edges
      .persist()
    val nodes = adj.select("node").distinct().persist()
    try {
      var lab = nodes.withColumn("lbl", col("node"))
      for (_ <- 1 to iters) {
        // One edge-sized exchange per round (r17): re-keying the joined
        // votes to hash(node) up front lets BOTH aggregations and the
        // final label join run exchange-free on that layout (hash(node)
        // clusters (node, lbl), and the round's pin hands the ranks back
        // still partitioned by node) — the old shape paid a second,
        // pair-sized exchange between the two aggregations.
        val votes = adj
          .join(lab.select(col("node").as("nbr"), col("lbl")), "nbr")
          .repartition(col("node"))
          .groupBy("node", "lbl").agg(count(lit(1)).as("c"))
        // min(struct(-c, lbl)) = max count, then smallest label
        val best = votes.groupBy("node")
          .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("b"))
          .select(col("node"), col("b.l").as("new_lbl"))
        lab = Checkpoints.pin(
          lab.join(best, Seq("node"), "left")
            .select(col("node"),
              coalesce(col("new_lbl"), col("lbl")).as("lbl")))
      }
      lab
    } finally { adj.unpersist(); nodes.unpersist() }
  }

  /** Multi-source BFS hop distance over the undirected graph
    * `edges(srcCol, dstCol)`: every node reachable from `seeds`
    * (a one-column frame of node ids) within `maxHops` hops gets its
    * MINIMUM hop count; unreachable nodes are absent. Fixed-hop
    * frontier expansion — hop h joins the previous frontier onto the
    * adjacency, anti-joins everything already labelled, and tags the
    * survivors with distance h — so the result is exactly the BFS
    * layering and bit-identical on any engine.
    *
    * Scale shape: the adjacency is symmetrized + de-duplicated +
    * hash-partitioned by the frontier join key once and persisted; a
    * hop is one equi-join + distinct + anti-join (all O(edges)), the
    * frontier only ever contains NEWLY discovered nodes (monotone
    * shrinking on diameter-bounded graphs), and lineage is cut per hop
    * via [[Checkpoints.pin]] — the standard "BFS as iterated hash
    * joins" shape that survives a billion-edge graph because no hop
    * ever re-touches settled nodes. */
  def bfsDistance(edges: DataFrame, srcCol: String, dstCol: String,
                  seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"need maxHops >= 1; got $maxHops")
    // repartition-then-distinct folds the dedup's exchange into the join
    // layout, and node ids keep the caller's type — both as in
    // [[labelPropagation]] (r17).
    val adj = edges.select(col(srcCol).as("node"), col(dstCol).as("nbr"))
      .unionAll(edges.select(col(dstCol).as("node"),
        col(srcCol).as("nbr")))
      .repartition(col("nbr"))
      .distinct()
      .persist()
    try {
      val s0 = seeds.toDF("node").distinct()
      var dist = Checkpoints.pin(s0.withColumn("d", lit(0L)))
      var frontier = dist.select("node")
      for (h <- 1 to maxHops) {
        // ONE pin per hop (r18; guide §1.2): the hop's new nodes ride
        // the distance union's own materialization, and the next
        // frontier derives from the PINNED union by a narrow filter
        // (d == h selects exactly this hop's candidates — cand is
        // distinct and anti-joined, so no duplicates). The old shape
        // pinned cand separately: a second full materialization pass
        // per hop that bought nothing the union's pin doesn't.
        val cand = adj.join(frontier.select(col("node").as("nbr")), "nbr")
          .select("node").distinct()
          .join(dist, Seq("node"), "left_anti")
          .withColumn("d", lit(h.toLong))
        dist = Checkpoints.pin(dist.unionByName(cand))
        frontier = dist.filter(col("d") === h).select("node")
      }
      dist
    } finally { adj.unpersist(); () }
  }
}
