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

  test("semDedup drops the larger id of a within-cluster near-dup pair") {
    // ids 1 and 2 are near-identical (cos ≈ 1) and co-cluster; 5 and 6
    // likewise in the other group. Survivors keep the smaller ids.
    val r = Clustering.semDedup(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.999).orderBy("id").collect()
    val kept = r.map(_.getLong(0)).toSet
    // Group A pairwise cosines top out at 0.949 (2 vs 3) and the zero
    // vector's NULL cosine never clears the bar — all four survive. Group
    // B's vectors all point at ~(1,1): every pair ≥ 0.999, so only the
    // smallest id (4) survives.
    assert(kept === Set(0L, 1L, 2L, 3L, 4L))
    // survivors' clusters match their kmeans assignment
    val asg = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2).collect().map(r2 => r2.getLong(0) -> r2.getInt(1)).toMap
    assert(r.forall(row => asg(row.getLong(0)) == row.getInt(1)))
  }

  test("semDedup at a low threshold keeps one representative per tight group") {
    // threshold 0.9: within each group every pair with cos ≥ .9 drops the
    // larger id. Group B's vectors (all ~(10,10)) are mutually ≥ .999 so
    // only id 4 survives group B.
    val r = Clustering.semDedup(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.9).collect()
    val kept = r.map(_.getLong(0)).toSet
    assert(kept.contains(4L) && !kept.contains(5L) && !kept.contains(6L) &&
      !kept.contains(7L))
  }

  test("semDedup never drops across clusters") {
    // Identical vectors in DIFFERENT clusters must both survive: build
    // two far-apart groups and give each one copy of the same direction?
    // Cross-cluster pairs are simply never compared — verify by running
    // with threshold 0 (every non-degenerate in-cluster pair collides):
    // one survivor per cluster plus the zero vector, whose NULL cosine
    // exempts it from ever matching.
    val r = Clustering.semDedup(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.0).collect()
    assert(r.map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 4L))
  }

  test("semDedup is invariant to the block count (plan shape, not result)") {
    val r2 = Clustering.semDedup(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.9, blocks = 2).orderBy("id").collect().toSeq
    val r7 = Clustering.semDedup(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.9, blocks = 7).orderBy("id").collect().toSeq
    assert(r2 === r7)
  }

  test("broadcast-join assignment path ≡ literal path (bit-identical argmin)") {
    val lit0 = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 3, iters = 3).orderBy("id").collect().toSeq
    val joined = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 3, iters = 3, literalCap = 0).orderBy("id").collect().toSeq
    assert(lit0 === joined)
  }

  test("semDedupAuto resolves k from the corpus (targetCell bounds cells)") {
    // 8 vectors, targetCell 4 → k = 2: same result as explicit k = 2
    val auto = Clustering.semDedupAuto(twoGroups, "vec_id", "embedding",
      targetCell = 4, iters = 2, threshold = 0.9).orderBy("id").collect().toSeq
    val manual = Clustering.semDedup(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2, threshold = 0.9).orderBy("id").collect().toSeq
    assert(auto === manual)
  }

  test("assignHierarchical with nCoarse=1 is the exact argmin") {
    val cents = Clustering.kmeansFit(twoGroups, "vec_id", "embedding",
      k = 3, iters = 2)
    val exact = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 3, iters = 2).orderBy("id").collect().toSeq
    val hier = Clustering.assignHierarchical(twoGroups, "vec_id", "embedding",
      cents, nCoarse = 1).orderBy("id").collect().toSeq
    assert(hier === exact)
  }

  test("assignHierarchical agrees with exact argmin on well-separated groups") {
    val cents = Clustering.kmeansFit(twoGroups, "vec_id", "embedding",
      k = 4, iters = 3)
    val exact = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 4, iters = 3).orderBy("id").collect().toSeq
    val hier = Clustering.assignHierarchical(twoGroups, "vec_id", "embedding",
      cents, nCoarse = 2).orderBy("id").collect().toSeq
    assert(hier === exact)
  }

  test("coarseCluster covers every centroid exactly once, deterministically") {
    val cents = IndexedSeq(
      Seq(0.0, 0.0), Seq(0.1, 0.1), Seq(10.0, 10.0), Seq(10.1, 10.1),
      Seq(20.0, 0.0), Seq(20.1, 0.1))
    val (cc, members) = Clustering.coarseCluster(cents, nCoarse = 3)
    assert(cc.size === 3)
    assert(members.values.flatten.toSeq.sorted === (0 until 6))
    val (cc2, members2) = Clustering.coarseCluster(cents, nCoarse = 3)
    assert(cc === cc2 && members === members2)
  }

  test("semDedupSampled with a full-corpus sample matches semDedupAuto") {
    // sampleCap ≥ n and k = 2 → nCoarse = 1 → exact assignment: the
    // sampled pipeline collapses to the auto one.
    val sampled = Clustering.semDedupSampled(twoGroups, "vec_id", "embedding",
      targetCell = 4, iters = 2, threshold = 0.9, sampleCap = 100)
      .orderBy("id").collect().toSeq
    val auto = Clustering.semDedupAuto(twoGroups, "vec_id", "embedding",
      targetCell = 4, iters = 2, threshold = 0.9)
      .orderBy("id").collect().toSeq
    assert(sampled === auto)
  }

  test("semDedupCapped drops banded-candidate near-dups within a cell") {
    // exact duplicates collide in EVERY SRP band (identical sign
    // patterns), so recall on them is 1 and the capped variant must
    // agree with exact semDedup on this corpus: ids 1, 3 duplicate
    // ids 0, 2; distinct directions survive.
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f)), (5L, Seq(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = Clustering.semDedupCapped(emb, "vec_id", "embedding",
      kCap = 1, iters = 1, threshold = 0.99, dim = 3)
      .select("id").as[Long].collect().toSet
    assert(r === Set(0L, 2L, 4L, 5L))
  }

  test("semDedupCapped keeps cross-cell duplicates (cell-conditional)") {
    // two far-apart groups force 2 cells under kCap=2; a duplicate pair
    // SPLIT across cells must both survive — SemDeDup semantics.
    val emb = Seq(
      (0L, Seq(10.0f, 10.0f)), (1L, Seq(10.0f, 10.0f)),
      (2L, Seq(-10.0f, -10.0f)), (3L, Seq(-10.0f, -10.0f))
    ).toDF("vec_id", "embedding")
    val r = Clustering.semDedupCapped(emb, "vec_id", "embedding",
      kCap = 2, iters = 2, threshold = 0.99, dim = 2, targetCell = 2)
      .select("id", "cluster").as[(Long, Int)].collect()
    val byCell = r.groupBy(_._2)
    // within each cell only the smaller id of the dup pair survives
    assert(r.map(_._1).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    byCell.values.foreach { members =>
      assert(members.length == 1) // each cell kept exactly one of its pair
    }
  }

  test("clusterProfile returns per-cluster sizes") {
    val a = Clustering.kmeansAssign(twoGroups, "vec_id", "embedding",
      k = 2, iters = 2)
    val p = Clustering.clusterProfile(a).orderBy("cluster").collect()
    assert(p.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((0, 4L), (1, 4L)))
  }
}
