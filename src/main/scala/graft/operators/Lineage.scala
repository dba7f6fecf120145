package graft.operators

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
  * empty; a depth cap guards against cycles (the reference implicitly
  * assumes acyclicity).
  *
  * Scale notes: the frontier shrinks monotonically for DAGs of bounded
  * depth (the reference's is 4-5 levels), so the expensive join is the
  * first one; `edges` should be pre-partitioned by `child` so every
  * iteration reuses the same shuffle-free join layout.
  */
object Lineage {
  val MaxDepth = 30

  /** All (node, ancestor, depth) pairs reachable by walking child→parent. */
  def ancestors(edges: DataFrame): DataFrame = {
    val e = edges.select(col("child"), col("parent"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var walk = e.select(col("child").as("node"), col("parent").as("anc"),
      lit(1L).as("depth"))
    var frontier = walk
    var depth = 1
    while (depth < MaxDepth && !frontier.isEmpty) {
      val next = frontier.alias("f")
        .join(e.alias("e"), col("f.anc") === col("e.child"))
        .select(col("f.node"), col("e.parent").as("anc"),
          (col("f.depth") + 1).as("depth"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      walk = walk.union(next)
      frontier = next
      depth += 1
    }
    walk
  }

  /** For every node in the DAG, its root ancestor (one with no parent) and
    * the distance to it — J9's organism-root walk. */
  def roots(edges: DataFrame): DataFrame = {
    val children = edges.select(col("child")).distinct()
    ancestors(edges).alias("w")
      .join(children.alias("c"), col("w.anc") === col("c.child"), "left_anti")
      .select(col("node"), col("anc").as("root"), col("depth"))
  }

  /** Descendants of `start` nodes (down-walk, J8): (start, descendant, depth). */
  def descendants(edges: DataFrame, start: DataFrame): DataFrame = {
    val down = edges.select(col("parent").as("child"), col("child").as("parent"))
    ancestors(down)
      .join(start, col("node") === start(start.columns.head), "left_semi")
      .select(col("node").as("start"), col("anc").as("descendant"), col("depth"))
  }
}
