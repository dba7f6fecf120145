package graft.operators

import graft.core.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sample-DAG traversals (SURVEY §2.4 J7-J9).
  *
  * The reference walks its sample parent/child DAG up (child→patient,
  * register-mtb-data-dropbox.py:645-666), down (patient→descendants,
  * :669-724) and to the roots (get-experimental-design-tsv/script.py:16-34).
  * Here the DAG is an edge table `(child, parent)` and every walk is an
  * iterated self-join to fixpoint — the standard Spark shape for recursive
  * CTEs. Each frontier is cached and the loop stops when the frontier is
  * empty. A graph still live at `MaxDepth` — a cycle, or a catalog far
  * deeper than any the reference produces (4-5 levels) — FAILS LOUDLY
  * instead of silently truncating: on a cycle the per-pair path counts
  * inflate every lap, so a truncated answer is not an approximation, it
  * is garbage with a green status.
  *
  * Scale notes: the frontier shrinks monotonically for DAGs of bounded
  * depth (the reference's is 4-5 levels), so the expensive join is the
  * first one; `edges` should be pre-partitioned by `child` so every
  * iteration reuses the same shuffle-free join layout.
  */
object Lineage {
  val MaxDepth = 30

  /** All (node, ancestor, depth) pairs reachable by walking child→parent.
    *
    * Each frontier is truncated with an eager [[Checkpoints.pin]]: an
    * iterative self-join otherwise accumulates a plan tree that grows with
    * depth (re-optimized and re-printed every iteration — measurably
    * pathological past ~10 levels). One session conf flips every walk to
    * reliable `checkpoint` for the multi-executor cluster posture. */
  def ancestors(edges: DataFrame): DataFrame = {
    val e = edges.select(col("child"), col("parent"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val first = e.select(col("child").as("node"), col("parent").as("anc"),
      lit(1L).as("depth"))
    val out = walk(e, first)
    e.unpersist()
    out
  }

  /** Iterate `first` (node, anc, depth=1) against the persisted edge table
    * to fixpoint. Each level is eagerly pinned, so the returned
    * union no longer references `e` — callers may unpersist it before
    * consuming the result. */
  private def walk(e: DataFrame, first: DataFrame): DataFrame = {
    var frontier = Checkpoints.pin(first)
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var depth = 1
    var done = false
    while (depth < MaxDepth && !done) {
      val next = Checkpoints.pin(frontier.alias("f")
        .join(e.alias("e"), col("f.anc") === col("e.child"))
        .select(col("f.node"), col("e.parent").as("anc"),
          (col("f.depth") + 1).as("depth")))
      if (next.isEmpty) done = true
      else { levels += next; frontier = next; depth += 1 }
    }
    if (!done) {
      // the loop ended by the depth bound, not by an empty frontier — but
      // nodes EXISTING at MaxDepth is legal (a chain of exactly that
      // length); only an EXPANDABLE frontier there proves a cycle or an
      // over-deep graph. One extra probe join distinguishes the two.
      val probe = frontier.alias("f")
        .join(e.alias("e"), col("f.anc") === col("e.child"))
      if (!probe.isEmpty)
        throw new IllegalStateException(
          s"lineage walk still live at depth $MaxDepth — cycle in the edge " +
            "table or a graph deeper than the supported bound; refusing to " +
            "return a silently truncated result")
    }
    levels.reduce(_ union _)
  }

  /** For every node in the DAG, its root ancestor (one with no parent) and
    * the distance to it — J9's organism-root walk. */
  def roots(edges: DataFrame): DataFrame = {
    val children = edges.select(col("child")).distinct()
    ancestors(edges).alias("w")
      .join(children.alias("c"), col("w.anc") === col("c.child"), "left_anti")
      .select(col("node"), col("anc").as("root"), col("depth"))
  }

  /** Descendants of `start` nodes (down-walk, J8): (start, descendant, depth).
    *
    * The iteration is SEEDED with the start set — the first join's left
    * side is the (typically tiny) start frontier, not the whole edge
    * table, so the work is O(reachable subtree), not O(V·depth). Walking
    * the entire reversed DAG and filtering afterwards would touch the
    * whole catalog to answer a one-patient question at 100×. Per-pair
    * multiplicity (number of distinct paths) is identical to the
    * unrestricted walk restricted to `start`, so results are unchanged. */
  def descendants(edges: DataFrame, start: DataFrame): DataFrame = {
    val down = edges.select(col("parent").as("child"), col("child").as("parent"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val startKeys = start.select(col(start.columns.head).as("node")).distinct()
    val first = startKeys.alias("s")
      .join(down.alias("e"), col("s.node") === col("e.child"))
      .select(col("s.node"), col("e.parent").as("anc"), lit(1L).as("depth"))
    val out = walk(down, first)
    down.unpersist()
    out.select(col("node").as("start"), col("anc").as("descendant"), col("depth"))
  }
}
