package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus clustering over embedding columns — the grouping stage of
  * cluster-conditional curation (SemDeDup-style cluster-then-dedup,
  * domain discovery for mixture weighting): k-means partitions the
  * corpus into semantic cells; downstream passes then dedup, score, or
  * sample WITHIN cells instead of across the whole corpus.
  *
  * Deterministic and engine-replayable by construction (gate: q_kmeans):
  *
  *  - Vectors are quantized to integral fixed-point (×1e6, the money-sum
  *    trick) so the centroid-update sums are BIGINT — exact and
  *    ORDER-INDEPENDENT, immune to float partial-aggregation order,
  *    which is what lets a shuffled 1000-executor run, a local[4] test
  *    and the DuckDB oracle agree bit-for-bit.
  *  - Init = the evenly-strided sample of [[Similarity.ivfCentroids]]
  *    (id % stride == 0, k smallest ids), no RNG.
  *  - Assignment = argmin over -2·v·c + |c|² per centroid — pure
  *    codegen'd expressions via [[Similarity.ivfCell]], centroids
  *    broadcast as plan literals, ties to the smaller cid.
  *  - Update = per-dimension BIGINT sums / count (ONE IEEE division per
  *    cell×dim); empty cells carry their previous centroid forward.
  *
  * Scale shape, per iteration: one scan of the persisted quantized
  * corpus (assignment is shuffle-free) + one posexplode→groupBy(cell,
  * pos) whose map-side combine reduces the shuffle to k·dim rows per
  * partition; the driver reads k·dim rows (bounded, the
  * data-dependent-config pattern). Lloyd at 100 TB is T scans — the
  * standard cost — and the final assignment writes partitioned by
  * `cluster` for cell-local downstream passes.
  */
object Clustering {

  /** Fixed-point quantization: array<float/double> → array<long> at
    * `scale`. round() ties away from zero in both Spark (BigDecimal
    * HALF_UP) and DuckDB, so the grids agree. */
  def quantize(vec: Column, scale: Double = 1e6): Column =
    transform(vec.cast("array<double>"),
      x => round(x * lit(scale), 0).cast("long"))

  /** (id, cluster) for every vector: `iters` Lloyd iterations from the
    * strided init, then a final assignment with the converged centroids.
    * Cluster ids are 0 until k (dense by construction of the init;
    * cells can be empty in the ASSIGNMENT if Lloyd moved their centroid
    * onto another's mass).
    *
    * Assignment picks its plan by k: at or under `literalCap` the
    * centroids embed as plan literals and the scan is shuffle-free
    * ([[Similarity.ivfCell]]); above it they broadcast as a k-row frame
    * and argmin is a map-side-combined min-of-struct aggregation —
    * literal expression trees grow O(k·dim) and fall out of codegen
    * long before k reaches the n/targetCell a large corpus needs. Both
    * paths compute the identical doubles (same left-to-right fold), so
    * the choice is invisible in the result (ClusteringSpec
    * cross-validates). Centroid UPDATES collect k·dim (cell, pos, sum,
    * count) rows per iteration — bounded, but a driver-side bound:
    * practical to k·dim ~ 10^7 (k in the tens of thousands at
    * dim 1024, the SemDeDup-paper operating range). */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, literalCap: Int = 64): DataFrame = {
    // ONE quantized corpus frame feeds Lloyd AND the final assignment
    // (r18; guide §1.2 — the old shape built and persisted it inside
    // kmeansFit, unpersisted it, then re-quantized the corpus from
    // scratch for the assignment pass). The assignment is pinned before
    // the unpersist so the cache is released eagerly, not leaked to the
    // caller's consumption order.
    val v = quantized(emb, idCol, vecCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val cents = fitQuantized(v, k, iters, literalCap)
      graft.core.Checkpoints.pin(
        assignCells(v, cents, literalCap)
          .select(col("id"), col("cell").as("cluster")))
    } finally { v.unpersist(); () }
  }

  /** The shared (id, q, vd) projection: quantized longs drive the exact
    * update sums; their double image (exact: |q| << 2^53) drives the
    * distance folds. */
  private def quantized(emb: DataFrame, idCol: String,
                        vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol)).as("q"))
      .withColumn("vd", transform(col("q"), x => x.cast("double")))

  /** Argmin centroid per row, plan chosen by k (see [[kmeansAssign]]).
    * Output: the input columns plus `cell` (alias `cluster`). */
  private def assignCells(v: DataFrame, cents: IndexedSeq[Seq[Double]],
                          literalCap: Int): DataFrame =
    if (cents.size <= literalCap)
      v.withColumn("cell", cellFor(col("vd"), cents))
    else {
        graft.GraftExtensions.register(v.sparkSession)
        val s = v.sparkSession
        val cdf = broadcast(s.createDataFrame(
          cents.zipWithIndex.map { case (c, i) => (i, c) }).toDF("cid", "c"))
        // cost = −2·v·c + |c|²: array_dot is the same left-to-right
        // double fold the literal path uses, and |c|² is folded the same
        // way ON THE DRIVER there — an executor-side dot of c with
        // itself reproduces it bit-for-bit.
        val cost = lit(-2.0) * Similarity.dot(col("vd"), col("c")) +
          Similarity.dot(col("c"), col("c"))
        // Slim argmin: only (id, cost, cid) flows through the n·k-row
        // aggregation — a first draft that carried q/vd (64 elements
        // each) through it measured 61× wall for 30× data; the winner
        // row joins back to the persisted vectors by id instead. min of
        // struct(cost, cid) is lexicographic → smallest cost, ties to
        // the smaller cid — the literal path's exact rule.
        val win = v.select(col("id"), col("vd"))
          .crossJoin(cdf)
          .select(col("id"), struct(cost.as("cost"), col("cid")).as("sc"))
          .groupBy(col("id"))
          .agg(min(col("sc")).as("m"))
          .select(col("id"), col("m.cid").as("cell"))
        v.join(win, Seq("id"))
    }

  /** Per-cluster sizes and mean in-cluster quantized-L2 cost — the
    * inertia readout that picks k or flags a degenerate clustering. */
  def clusterProfile(assign: DataFrame): DataFrame =
    assign.groupBy(col("cluster")).agg(count(lit(1)).as("n"))

  /** Lloyd TRAINING only: the converged centroids, without assigning the
    * corpus — so a 100 TB run can fit on a bounded sample (`kmeansFit`
    * over a [[Similarity.hashStratum]]) and pay the full-corpus scan
    * only in the one [[assignHierarchical]] pass. Same quantized
    * arithmetic as [[kmeansAssign]] (which delegates here). */
  def kmeansFit(emb: DataFrame, idCol: String, vecCol: String,
                k: Int, iters: Int,
                literalCap: Int = 64): IndexedSeq[Seq[Double]] = {
    val v = quantized(emb, idCol, vecCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try fitQuantized(v, k, iters, literalCap)
    finally { v.unpersist(); () }
  }

  /** Lloyd over an already-persisted quantized frame — shared by
    * [[kmeansFit]] (which owns its persist) and [[kmeansAssign]] (which
    * reuses the same frame for the final assignment; r18). Identical
    * arithmetic to the pre-split code: same strided init, same
    * assignment fold, same BIGINT update sums. */
  private def fitQuantized(v: DataFrame, k: Int, iters: Int,
                           literalCap: Int): IndexedSeq[Seq[Double]] = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val n = v.count()
    require(n >= k, s"need at least k=$k vectors, have $n")
    val stride = math.max(1L, n / k)
    var cents: IndexedSeq[Seq[Double]] = v
      .filter(pmod(col("id"), lit(stride)) === 0)
      .orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](2).toSeq).toIndexedSeq
    for (_ <- 1 to iters) {
      val assigned = assignCells(v, cents, literalCap)
      val upd = assigned
        .select(col("cell"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
        .collect()
        .groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (prev, cid) =>
        upd.get(cid) match {
          case Some(rows) =>
            rows.sortBy(_.getInt(1)).map(r =>
              r.getLong(2).toDouble / r.getLong(3)).toSeq
          case None => prev
        }
      }
    }
    cents
  }

  /** Two-level approximate argmin against FIXED centroids: the k
    * centroids are themselves Lloyd-clustered into ~√k coarse cells ON
    * THE DRIVER (k points — trivial), each corpus vector probes its
    * nearest coarse cell (n·√k slim rows) and then only that cell's
    * member centroids (n·(k/√k) expected) — n·O(√k) work instead of
    * [[kmeansAssign]]'s n·k, the assignment shape that holds when
    * k ∝ n. Approximate: the true argmin centroid can sit in a
    * non-probed coarse cell (ClusteringSpec pins agreement and the
    * nCoarse=1 ≡ exact identity); ranking within the probed cell uses
    * the same −2·v·c+|c|² doubles as the exact paths. */
  def assignHierarchical(emb: DataFrame, idCol: String, vecCol: String,
                         cents: IndexedSeq[Seq[Double]],
                         nCoarse: Int): DataFrame = {
    require(cents.nonEmpty, "need at least one centroid")
    require(nCoarse > 0, s"nCoarse must be positive, got $nCoarse")
    graft.GraftExtensions.register(emb.sparkSession)
    val s = emb.sparkSession
    val (coarse, members) = coarseCluster(cents, math.min(nCoarse, cents.size))
    // persisted (r18): v feeds the coarse argmin AND the fine stage's
    // join-back — one corpus scan instead of two; the pinned (id,
    // cluster) result below releases it eagerly
    val v = emb.select(col(idCol).cast("long").as("id"),
      transform(quantize(col(vecCol)), x => x.cast("double")).as("vd"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val coarseDf = broadcast(s.createDataFrame(
      coarse.zipWithIndex.map { case (c, j) => (j, c) }).toDF("gid", "gc"))
    val gCost = lit(-2.0) * Similarity.dot(col("vd"), col("gc")) +
      Similarity.dot(col("gc"), col("gc"))
    // Slim rows through BOTH argmin aggregations (the wide-array-through-
    // agg shape measured 61× in assignCells' first draft); the winner
    // joins back to the projected vectors for the fine stage.
    val winG = v.crossJoin(coarseDf)
      .select(col("id"), struct(gCost.as("cost"), col("gid")).as("gsc"))
      .groupBy(col("id"))
      .agg(min(col("gsc")).as("g"))
      .select(col("id"), col("g.gid").as("gid"))
    val withGroup = v.join(winG, Seq("id"))
    val memberDf = broadcast(s.createDataFrame(
      members.toSeq.flatMap { case (j, cids) =>
        cids.map(cid => (j, cid, cents(cid)))
      }).toDF("gid", "cid", "c"))
    val cost = lit(-2.0) * Similarity.dot(col("vd"), col("c")) +
      Similarity.dot(col("c"), col("c"))
    try graft.core.Checkpoints.pin(
      withGroup.join(memberDf, Seq("gid"))
        .select(col("id"), struct(cost.as("cost"), col("cid")).as("sc"))
        .groupBy(col("id"))
        .agg(min(col("sc")).as("m"))
        .select(col("id"), col("m.cid").as("cluster")))
    finally { v.unpersist(); () }
  }

  /** Driver-side Lloyd over the CENTROID points (k of them — in-memory
    * arithmetic, no Spark job): (coarse centroids, coarse → member
    * centroid ids). Deterministic: strided init, squared-L2 argmin with
    * ties to the smaller index, empty coarse cells carry forward. */
  private[operators] def coarseCluster(cents: IndexedSeq[Seq[Double]],
      nCoarse: Int, iters: Int = 3): (IndexedSeq[Seq[Double]], Map[Int, Seq[Int]]) = {
    val dim = cents.head.size
    def d2(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val stride = math.max(1, cents.size / nCoarse)
    var cc = (0 until cents.size by stride).take(nCoarse).map(cents(_))
    def assign(): IndexedSeq[Int] = cents.map { p =>
      var best = 0; var bestD = d2(p, cc(0)); var j = 1
      while (j < cc.size) {
        val d = d2(p, cc(j)); if (d < bestD) { best = j; bestD = d }; j += 1
      }
      best
    }
    for (_ <- 1 to iters) {
      val a = assign()
      cc = cc.indices.map { j =>
        val mem = cents.indices.filter(a(_) == j)
        if (mem.isEmpty) cc(j)
        else (0 until dim).map(d => mem.map(cents(_)(d)).sum / mem.size)
      }
    }
    val a = assign()
    (cc, cents.indices.groupBy(a).map { case (j, ms) => j -> ms.sorted.toSeq })
  }

  /** The 100 TB SemDeDup deployment shape end-to-end: fit centroids on a
    * bounded hash-rank sample (`sampleCap` rows — training never scans
    * the corpus), assign every vector with the two-level probe
    * (n·O(√k)), then in-cell blocked near-dup removal exactly as
    * [[semDedup]]. Approximate only in WHICH cell a vector lands —
    * the in-cell pair predicate is exact. */
  def semDedupSampled(emb: DataFrame, idCol: String, vecCol: String,
                      targetCell: Int, iters: Int, threshold: Double,
                      sampleCap: Int = 100000, blocks: Int = 4): DataFrame = {
    require(targetCell > 0, s"targetCell must be positive, got $targetCell")
    graft.GraftExtensions.register(emb.sparkSession)
    val n = emb.count()
    val k = math.max(1L, (n + targetCell - 1) / targetCell).toInt
    val sample = Similarity.hashStratum(emb, idCol, sampleCap)
    val cents = kmeansFit(sample, idCol, vecCol,
      k = math.min(k, sampleCap), iters = iters)
    val assign = assignHierarchical(emb, idCol, vecCol, cents,
      nCoarse = math.max(1, math.sqrt(cents.size.toDouble).round.toInt))
    dedupWithinClusters(emb, idCol, vecCol, assign, threshold, blocks)
  }

  /** The in-cell pair stage shared by [[semDedup]] and
    * [[semDedupSampled]]: blocked triangle equi-join within each
    * cluster, drop any vector with a smaller-id cluster-mate at or
    * above `threshold`. */
  private def dedupWithinClusters(emb: DataFrame, idCol: String,
      vecCol: String, assign: DataFrame, threshold: Double,
      blocks: Int): DataFrame = {
    require(blocks > 0, s"blocks must be positive, got $blocks")
    // Persisted (r18; guide §1.2): this frame feeds BOTH sides of the
    // blocked triangle join AND the final anti-join — unpersisted, the
    // corpus scan + assignment join recomputed once per consumer (3×).
    // The survivor set is pinned before release so the cache cannot
    // leak past the operator.
    val vecs = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("nm", sqrt(Similarity.dot(col("v"), col("v"))))
      .join(assign, "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try dedupPersistedVecs(vecs, threshold, blocks)
    finally { vecs.unpersist(); () }
  }

  /** The triangle + anti-join tail of [[dedupWithinClusters]] over the
    * persisted (id, v, nm, cluster) frame. */
  private def dedupPersistedVecs(vecs: DataFrame, threshold: Double,
                                 blocks: Int): DataFrame = {
    val g = vecs.withColumn("g", pmod(col("id"), lit(blocks)).cast("int"))
    val lhs = g
      .withColumn("bj", explode(sequence(col("g"), lit(blocks - 1))))
      .select(col("cluster"), col("g").as("bi"), col("bj"),
        col("id").as("ida"), col("v").as("va"), col("nm").as("na"))
    val rhs = g
      .withColumn("bi", explode(sequence(lit(0), col("g"))))
      .select(col("cluster"), col("bi"), col("g").as("bj"),
        col("id").as("idb"), col("v").as("vb"), col("nm").as("nb"))
    // try_divide: a zero-norm vector's cosine is NULL (0/0 errors under
    // ANSI), and NULL ≥ threshold is never true — degenerate vectors
    // survive rather than crash the pass or match everything.
    val dropped = lhs.join(rhs, Seq("cluster", "bi", "bj"))
      .filter(col("bi") =!= col("bj") || col("ida") < col("idb"))
      .withColumn("sim",
        round(try_divide(Similarity.dot(col("va"), col("vb")),
          col("na") * col("nb")), 4))
      .filter(col("sim") >= threshold)
      .select(greatest(col("ida"), col("idb")).as("id"))
      .distinct()
    graft.core.Checkpoints.pin(
      vecs.join(dropped, Seq("id"), "left_anti").select("id", "cluster"))
  }

  /** SemDeDup-style cluster-conditional near-duplicate removal: k-means
    * partitions the corpus, then pairwise cosine runs ONLY within each
    * cluster and a vector is dropped when any smaller-id cluster-mate
    * sits at or above `threshold` (one-pass pairwise semantics — no
    * transitive chaining, matching the published algorithm; the
    * connected-components path in [[Dedup]] is the chaining alternative).
    * Returns the survivors as (id, cluster).
    *
    * Scale shape: the quadratic compare that would be O(n²) corpus-wide
    * becomes Σ n_c² over clusters — the whole point of clustering first —
    * and each cluster's triangle is spread as pure EQUI-join tasks via
    * the same blocked (bi, bj) scheme as
    * [[Similarity.embeddingNearDupExactBlocked]], keyed by (cluster, bi,
    * bj) so one big cluster becomes blocks·(blocks+1)/2 independent
    * tasks instead of one straggler. No cartesian/BNLJ node anywhere.
    * At 100 TB, k grows with the corpus to bound n_c (the paper's
    * sqrt-scaling); the pair stage never sees a cross-cluster pair. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String, k: Int,
               iters: Int, threshold: Double, blocks: Int = 4): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    val assign = kmeansAssign(emb, idCol, vecCol, k, iters)
    dedupWithinClusters(emb, idCol, vecCol, assign, threshold, blocks)
  }

  /** [[semDedup]] with k resolved FROM the corpus: k = ceil(n /
    * targetCell), so expected cell size stays ~targetCell no matter how
    * large the corpus grows — the deployable scaling (the SemDeDup
    * paper's k ∝ n posture); with fixed k the per-cell quadratic term
    * grows as (n/k)², which a 100× run cannot afford. One bounded count
    * resolves k (the data-dependent-config pattern shared with
    * [[Similarity.autoR]]). */
  def semDedupAuto(emb: DataFrame, idCol: String, vecCol: String,
                   targetCell: Int, iters: Int, threshold: Double,
                   blocks: Int = 4): DataFrame = {
    require(targetCell > 0, s"targetCell must be positive, got $targetCell")
    val n = emb.count()
    val k = math.max(1L, (n + targetCell - 1) / targetCell).toInt
    semDedup(emb, idCol, vecCol, k, iters, threshold, blocks)
  }

  private def cellFor(vec: Column, cents: Seq[Seq[Double]]): Column =
    Similarity.ivfCell(vec, cents.zipWithIndex.map { case (c, i) => (i, c) })

  /** SemDeDup past the point where even k ∝ n centroids stop fitting:
    * k is CAPPED at `kCap` (bounded sample fit, bounded assign
    * broadcast — the terms that grow with k), cells therefore grow as
    * n/kCap, and the in-cell pair stage switches from the blocked exact
    * triangle (per-cell (n/k)² — unaffordable on big cells) to
    * SRP-banded LSH candidates keyed by (cell, band, bucket) with exact
    * cosine verification — per-cell cost ~linear in cell size. This is
    * the [[Similarity.ivfCell]]-style partition + in-cell
    * [[Similarity.embeddingNearDupBanded]] composition BASELINE.md
    * round 8 named as the step past semDedupSampled's measured range.
    *
    * Approximation surface, stated honestly: WHICH cell a vector lands
    * in (shared with [[semDedupSampled]]) and SRP candidate recall
    * (bands·(1−p^r) misses; mild at near-dup thresholds ≥ 0.8, thin at
    * 0.4 — [[Similarity.embeddingNearDupAuto]]'s documented trade). The
    * drop rule over verified candidates is [[semDedup]]'s exact
    * smaller-id pairwise semantics. Planes-per-band adapts to the
    * EXPECTED CELL SIZE n/k (not n), so band occupancy per cell — and
    * with it candidate volume per row — stays constant as the corpus
    * outgrows the capped centroid set. */
  def semDedupCapped(emb: DataFrame, idCol: String, vecCol: String,
                     kCap: Int, iters: Int, threshold: Double, dim: Int,
                     bands: Int = 8, targetOccupancy: Int = 8,
                     sampleCap: Int = 100000, rMax: Int = 24,
                     targetCell: Int = 256): DataFrame = {
    require(kCap > 0, s"kCap must be positive, got $kCap")
    graft.GraftExtensions.register(emb.sparkSession)
    val n = emb.count()
    // below the cap, cells follow the sampled variant's targetCell
    // sizing; the cap only bites once ceil(n/targetCell) exceeds it
    val k = math.min(kCap.toLong,
      math.max(1L, (n + targetCell - 1) / targetCell)).toInt
    val sample = Similarity.hashStratum(emb, idCol, sampleCap)
    val cents = kmeansFit(sample, idCol, vecCol,
      k = math.min(k, sampleCap), iters = iters)
    val assign = assignHierarchical(emb, idCol, vecCol, cents,
      nCoarse = math.max(1, math.sqrt(cents.size.toDouble).round.toInt))
    val cellSz = math.max(1L, n / cents.size)
    val planes = Similarity.hyperplanePool(bands,
      Similarity.autoR(cellSz, targetOccupancy, rMax), dim)
    // persisted (r18): feeds the banded self-join (both sides), the two
    // verify joins and the final anti-join — 5 consumers of one corpus
    // scan + assignment join; pinned result releases it eagerly below
    val vecs = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .join(assign, "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val widened = vecs.select(col("id"), col("cluster"),
      col("v").cast("array<double>").as("vd"))
    val bandStructs = planes.indices.map { b =>
      val bucket = planes(b).zipWithIndex.map { case (p, i) =>
        when(Similarity.dot(col("vd"), typedLit(p)) >= 0, 1L << i)
          .otherwise(0L)
      }.reduce(_ + _)
      struct(lit(b).as("band"), bucket.as("bucket"))
    }
    val sigs = widened.select(col("id"), col("cluster"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("cluster"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"), col("id"))
    val cands = sigs.alias("x").join(sigs.alias("y"),
        col("x.cluster") === col("y.cluster") &&
          col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"))
      .distinct()
    val vn = vecs.withColumn("nm", sqrt(Similarity.dot(col("v"), col("v"))))
    val dropped = cands
      .join(vn.select(col("id").as("ida"), col("v").as("va"),
        col("nm").as("na")), Seq("ida"))
      .join(vn.select(col("id").as("idb"), col("v").as("vb"),
        col("nm").as("nb")), Seq("idb"))
      .withColumn("sim",
        round(try_divide(Similarity.dot(col("va"), col("vb")),
          col("na") * col("nb")), 4))
      .filter(col("sim") >= threshold)
      .select(greatest(col("ida"), col("idb")).as("id"))
      .distinct()
    try graft.core.Checkpoints.pin(
      vecs.join(dropped, Seq("id"), "left_anti").select("id", "cluster"))
    finally { vecs.unpersist(); () }
  }
}
