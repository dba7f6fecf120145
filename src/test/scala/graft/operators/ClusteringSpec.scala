package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // Two tight groups on a line: ids 0..3 near 0.0, ids 4..7 near 10.0.
  // k=2, stride=4 → init centroids from ids 0 and 4 — one per group, so
  // one Lloyd iteration converges and every id clusters with its group.
  private def twoGroups = Seq(
    (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.1f, 0.0f)),
    (2L, Seq(0.2f, 0.1f)), (3L, Seq(0.1f, 0.1f)),
    (4L, Seq(10.0f, 10.0f)), (5L, Seq(10.1f, 10.0f)),
    (6L, Seq(10.2f, 10.1f)), (7L, Seq(10.1f, 10.1f))
  ).toDF("vec_id", "embedding")

  test("kmeansAssign separates two obvious groups") {
    val r = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2).orderBy("id").collect()
    val byCluster = r.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(0)).toSet)
    assert(byCluster(0) === Set(0L, 1L, 2L, 3L))
    assert(byCluster(1) === Set(4L, 5L, 6L, 7L))
  }

  test("assignment is invariant to input partitioning (order-free sums)") {
    val base = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 2, iters = 3).orderBy("id").collect().toSeq
    val shuffled = Clustering.kmeansAssign(
      twoGroups.repartition(7, col("embedding")), "vec_id", "embedding",
      k = 2, iters = 3).orderBy("id").collect().toSeq
    assert(base === shuffled)
  }

  test("iters=0 assigns by the strided init centroids directly") {
    // centroids = vectors of ids 0 and 4; nearest-centroid check by hand
    val r = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 2, iters = 0).orderBy("id").collect()
    assert(r.map(_.getInt(1)).toSeq === Seq(0, 0, 0, 0, 1, 1, 1, 1))
  }

  test("an emptied cell carries its centroid instead of crashing") {
    // k=3 over the same 8 points: stride=2 → init ids 0, 2, 4. After one
    // update, centroid 1 (id 2's cell) may lose all points to centroid
    // 0's mass; iterations must still complete with k distinct cids
    // available and every point assigned.
    val r = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 3, iters = 4).collect()
    assert(r.length === 8)
    assert(r.map(_.getInt(1)).forall(c => c >= 0 && c < 3))
  }

  test("quantize rounds ties away from zero") {
    // binary-exact inputs so the tie is a true tie on the grid
    val r = Seq((1L, Seq(2.5f, -2.5f, 0.25f)))
      .toDF("id", "v")
      .select(Clustering.quantize(col("v"), scale = 1.0).as("q"))
      .head().getSeq[Long](0)
    assert(r === Seq(3L, -3L, 0L))
  }

  test("clusterProfile returns per-cluster sizes") {
    val a = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2)
    val p = Clustering.clusterProfile(a).orderBy("cluster").collect()
    assert(p.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((0, 4L), (1, 4L)))
  }
}
