package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one broadcast of the query
  * vector(s), one scan, one TopK (Spark plans `orderBy().limit(k)` as a
  * per-partition TakeOrdered + driver merge, no full sort/shuffle).
  *
  * Scale path: sign-random-projection LSH — bucket every vector by the
  * sign pattern of `nPlanes` fixed hyperplane dot products, then search
  * only the query's bucket. At 100 TB the bucketed table is written
  * partitioned by bucket so a query prunes to one partition.
  */
object Similarity {
  /** Portable dot product: `zip_with`/`aggregate` fold — works on any
    * session, but higher-order lambdas evaluate interpretively. */
  def dotPortable(x: Column, y: Column): Column = aggregate(
    zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  /** Native dot product (graft's `array_dot` expression — one JIT'd
    * loop, same left-to-right double accumulation). Requires
    * [[graft.GraftExtensions]] on the session; every graft entry point
    * registers it. */
  def dot(x: Column, y: Column): Column = call_function("array_dot", x, y)

  /** Cosine similarity between two array<float/double> columns, computed
    * in double via the native kernel. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Top-k most-similar vectors to a single query vector.
    * @param query one-row frame with the query vector column named `qv` */
  def bruteForceKnn(emb: DataFrame, idCol: String, vecCol: String,
                    query: DataFrame, k: Int): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession) // standalone sessions
    emb.crossJoin(broadcast(query))
      .withColumn("sim", round(cosine(col(vecCol), col("qv")), 4))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .drop("qv")
  }

  /** Int8 symmetric scalar quantization of a vector column: per-vector
    * scale = max|x|/127, codes = round(x/scale) ∈ [−127, 127]. Returns a
    * struct<q: array<int>, scale: double>. This is the 4× storage/IO
    * compression a 100 TB embedding store runs on (FAISS SQ8-style):
    * the int8 codes ship to executors at a quarter the bytes, and the
    * scale rides along for reconstruction. An all-zero vector gets
    * scale 0 and all-zero codes. Every step (double cast → abs → max →
    * divide → round-half-away) is engine-portable, so a reconstruction
    * replays bit-for-bit in an oracle. */
  def quantizeInt8(vec: Column): Column = {
    val vd = transform(vec, x => x.cast("double"))
    val mx = array_max(transform(vd, x => abs(x)))
    val scale = mx / lit(127.0)
    struct(
      when(mx === 0d, transform(vd, _ => lit(0)))
        .otherwise(transform(vd, x => round(x / scale, 0).cast("int")))
        .as("q"),
      scale.as("scale"))
  }

  /** Reconstruction of [[quantizeInt8]]'s output: codes · scale, as
    * array<double>. */
  def dequantizeInt8(qz: Column): Column =
    transform(qz.getField("q"),
      x => x.cast("double") * qz.getField("scale"))

  /** Top-k cosine ANN over int8-quantized vectors: quantize, reconstruct,
    * rank by exact cosine of the RECONSTRUCTION against the broadcast
    * query — the asymmetric-distance pattern (full-precision query,
    * compressed corpus). Same plan shape as [[bruteForceKnn]] (scan +
    * TakeOrdered, no shuffle); at scale the quantized corpus is what
    * sits on disk, so the scan reads 1/4 the bytes. Ranking differs
    * from full precision only by quantization error (≤ scale/2 per
    * component); SimilaritySpec pins the recall on a known corpus. */
  def knnInt8(emb: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, k: Int): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    emb.withColumn("__qz", quantizeInt8(col(vecCol)))
      .withColumn("__recon", dequantizeInt8(col("__qz")))
      .crossJoin(broadcast(query))
      // exact double widening of the (possibly float) query — array_dot
      // wants both sides the same element type
      .withColumn("__qvd", transform(col("qv"), x => x.cast("double")))
      .withColumn("sim", round(cosine(col("__recon"), col("__qvd")), 4))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .drop("qv", "__qz", "__recon", "__qvd")
  }

  /** Deterministic pseudo-random hyperplanes (seeded, data-independent). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id for a vector column. Written as the
    * portable fold so it works on any session; on a graft session the
    * [[graft.plans.RewriteDotProduct]] rule turns each plane dot into the
    * native kernel (widening a float vector with an exact cast). */
  def srpBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.size <= 64,
      s"srpBucket packs sign bits into a long; ${planes.size} planes > 64 " +
        "would wrap the shift and silently collide buckets")
    planes.zipWithIndex.map { case (p, i) =>
      val d = dotPortable(vec, typedLit(p))
      when(d >= 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Embedding near-duplicate pairs, exact: all (a < b) pairs with cosine
    * ≥ threshold. O(n²) compare — the correctness baseline the bucketed
    * variant is judged against. */
  def embeddingNearDupExact(emb: DataFrame, idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    // Norms are computed once per vector (n rows), not once per pair
    // (n² rows); sqrt(dot(v,v)) on the same input bits gives the same
    // double either way, so oracle parity is preserved.
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      sqrt(dot(col(vecCol), col(vecCol))).as("na"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      sqrt(dot(col(vecCol), col(vecCol))).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Deterministic hash-rank stratum: the `cap` vectors with the smallest
    * Knuth-multiplicative-hash values — a fixed-SIZE sample (unlike a
    * mod-filter, whose yield grows with the corpus), so any downstream
    * pairwise compare is bounded no matter how large the input gets.
    * Plans as per-partition TakeOrdered + merge (no full sort). The hash
    * `(id * 2654435761) mod 2^32` is chosen over xxhash64 because the
    * oracle side (any ANSI engine) can replay it with plain integer
    * arithmetic. Assumes non-negative ids below ~3.4e9 (≈ 2^63 /
    * 2654435761 — beyond that the product overflows int64: ANSI engines
    * error, non-ANSI Spark silently wraps); ties broken by id for full
    * determinism. */
  /** The Knuth-multiplicative rank `(id · 2654435761) mod 2^32` shared
    * by [[hashStratum]] and [[Stats.groupSample]] — ONE definition so
    * the documented portability contract (non-negative ids below
    * ~3.4e9; ANSI engines error beyond, non-ANSI Spark silently wraps;
    * negative ids split pmod-vs-% between engines) can't drift between
    * call sites. */
  def knuthRank(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L))

  def hashStratum(df: DataFrame, idCol: String, cap: Int): DataFrame =
    df.withColumn("__h", knuthRank(col(idCol)))
      .orderBy(col("__h"), col(idCol)).limit(cap)
      .drop("__h")

  /** Exact all-pairs cosine compare as a pure EQUI-join — the blocked
    * "triangle distribution" shape: rows are assigned to one of `blocks`
    * buckets, and each of the blocks·(blocks+1)/2 bucket-PAIRS becomes
    * one equi-join key, so the quadratic work spreads evenly over the
    * cluster as ordinary shuffle-hash-join tasks (no CartesianProduct,
    * no BroadcastNestedLoopJoin — the two plan shapes that die at scale).
    * A row in bucket g is replicated to key (g, j) for j ≥ g on the left
    * and (i, g) for i ≤ g on the right: a cross-bucket pair meets exactly
    * once (in bucket order, output normalized via least/greatest), a
    * same-bucket pair meets twice and is kept once by `id_a < id_b`.
    *
    * Still O(n²) WORK by definition of "exact" — callers must bound n
    * first (e.g. [[hashStratum]]); this shape bounds the per-task cost
    * and keeps the plan equi-join-only. */
  def embeddingNearDupExactBlocked(emb: DataFrame, idCol: String,
                                   vecCol: String, threshold: Double,
                                   blocks: Int = 8): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    // spread (r18): the per-row norm dot + both explode fan-outs were
    // pinned to the single scan split; no-op at production split counts
    val vecs = graft.core.Tables.spread(
        emb.select(col(idCol).as("id"), col(vecCol).as("v"),
          sqrt(dot(col(vecCol), col(vecCol))).as("nm")))
      .withColumn("g", pmod(col("id"), lit(blocks)).cast("int"))
    val lhs = vecs
      .withColumn("bj", explode(sequence(col("g"), lit(blocks - 1))))
      .select(col("g").as("bi"), col("bj"),
        col("id").as("ida"), col("v").as("va"), col("nm").as("na"))
    val rhs = vecs
      .withColumn("bi", explode(sequence(lit(0), col("g"))))
      .select(col("bi"), col("g").as("bj"),
        col("id").as("idb"), col("v").as("vb"), col("nm").as("nb"))
    lhs.join(rhs, Seq("bi", "bj"))
      .filter(col("bi") =!= col("bj") || col("ida") < col("idb"))
      .withColumn("sim",
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 4))
      .filter(col("sim") >= threshold)
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"), col("sim"))
  }

  /** Embedding near-duplicate pairs at scale: banded SRP-LSH. The
    * `nPlanes` hyperplanes split into `bands` groups of r = nPlanes/bands
    * planes; each band yields an r-bit bucket, and two vectors are
    * candidates if ANY band's buckets collide (OR-amplification — the
    * same band/bucket shape as [[Dedup.lshBands]]). Recall rises with
    * more bands, candidate volume falls with more planes per band.
    *
    * Shuffle shape that survives 100×: the banding self-join carries only
    * compact (band, bucket, id) rows — never the vectors — and candidate
    * pairs are deduped BEFORE the verify stage joins the two vectors back
    * for the exact cosine. No non-equi join anywhere, so Catalyst plans
    * hash joins, not BroadcastNestedLoop. */
  def embeddingNearDupBucketed(emb: DataFrame, idCol: String, vecCol: String,
                               threshold: Double, nPlanes: Int, dim: Int,
                               bands: Int = 1): DataFrame = {
    require(nPlanes % bands == 0,
      s"nPlanes=$nPlanes must be divisible by bands=$bands")
    embeddingNearDupBanded(emb, idCol, vecCol, threshold,
      hyperplanes(nPlanes, dim).grouped(nPlanes / bands).toSeq)
  }

  /** [[embeddingNearDupBucketed]] with the planes given explicitly per
    * band — the shared body behind the fixed and adaptive configs. */
  def embeddingNearDupBanded(emb: DataFrame, idCol: String, vecCol: String,
                             threshold: Double,
                             bandPlanes: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(bandPlanes.forall(_.size <= 64),
      s"r=${bandPlanes.map(_.size).max} sign bits per band > 64 would wrap " +
        "the long shift and silently collide distinct sign patterns into one bucket")
    graft.GraftExtensions.register(emb.sparkSession)
    val bands = bandPlanes.size
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    // The banding dots run against a double-widened copy of the vector,
    // projected ONCE per row (float→double is exact, so buckets — sign
    // patterns — are unchanged), and call the native kernel directly: 32
    // JIT'd loops per row, not 32 interpreted HOF lambdas. The widened
    // frame is spread (r18): bands·r dots per row fused into a
    // one-row-group scan ran single-task (measured 2.3 s of a 4.5 s
    // cell); at production split counts spread is a no-op.
    val widened = graft.core.Tables.spread(
      vecs.select(col("id"), col("v").cast("array<double>").as("vd")))
    val bandStructs = (0 until bands).map { b =>
      val bucket = bandPlanes(b).zipWithIndex.map { case (p, i) =>
        when(dot(col("vd"), typedLit(p)) >= 0, 1L << i).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(b).as("band"), bucket.as("bucket"))
    }
    val sigs = widened.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
    val cands = sigs.alias("x").join(sigs.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cands
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Multi-probe twin of [[embeddingNearDupBanded]] (Lv et al.,
    * "Multi-Probe LSH", VLDB 2007): each row probes, per band, its own
    * bucket AND every bucket at Hamming distance 1 — the r
    * single-plane flips — so a pair split by ONE boundary hyperplane
    * in every band is still found. That is exactly where
    * occupancy-targeted banding loses its recall (r11 scorecard: the
    * auto config measured 0.21 recall vs exact cosine at sf0.1 —
    * deep buckets need large r, and per-band recall p^r collapses);
    * probing buys the recall back WITHOUT shrinking r, so candidate
    * volume stays occupancy-controlled. Cost shape: the probe side
    * fans out (r+1)× per band, the BUILD side stays one signature per
    * band, and the join remains a pure (band, bucket) equi-join —
    * probe(x) ⋈ true(y) over x.id < y.id covers both directions
    * because 1-flip adjacency is symmetric. Exact-cosine verification
    * keeps precision 1.0 as in every banded config. */
  def embeddingNearDupMultiprobe(emb: DataFrame, idCol: String,
                                 vecCol: String, threshold: Double,
                                 bandPlanes: Seq[Seq[Seq[Double]]]): DataFrame = {
    require(bandPlanes.forall(_.size <= 64),
      s"r=${bandPlanes.map(_.size).max} sign bits per band > 64 would wrap " +
        "the long shift and silently collide distinct sign patterns into one bucket")
    graft.GraftExtensions.register(emb.sparkSession)
    val bands = bandPlanes.size
    val vecs = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    // spread: same single-task banding-scan rationale as
    // [[embeddingNearDupBanded]] (r18)
    val widened = graft.core.Tables.spread(
      vecs.select(col("id"), col("v").cast("array<double>").as("vd")))
    val bandStructs = (0 until bands).map { b =>
      val bucket = bandPlanes(b).zipWithIndex.map { case (p, i) =>
        when(dot(col("vd"), typedLit(p)) >= 0, 1L << i).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(b).as("band"), bucket.as("bucket"))
    }
    val sigs = widened.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket"), col("id"))
    // per-band probe set: the true bucket + its r one-bit flips
    val rByBand = typedLit((0 until bands).map(b => b -> bandPlanes(b).size).toMap)
    val probeBuckets = concat(array(col("bucket")),
      transform(sequence(lit(0), element_at(rByBand, col("band")) - 1),
        i => col("bucket").bitwiseXOR(
          call_function("shiftleft", lit(1L), i.cast("int")))))
    val probes = sigs.select(col("band"), col("id"),
      explode(probeBuckets).as("bucket"))
    val cands = probes.alias("x").join(sigs.alias("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cands
      .join(vecs.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .withColumn("sim", round(cosine(col("va"), col("vb")), 4))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** [[embeddingNearDupAuto]]'s occupancy-adaptive config under
    * multi-probe retrieval — same r, same linear candidate control,
    * recall recovered by the 1-flip probes. */
  def embeddingNearDupAutoProbed(emb: DataFrame, idCol: String,
                                 vecCol: String, threshold: Double,
                                 dim: Int, bands: Int = 8,
                                 targetOccupancy: Int = 8,
                                 rMax: Int = 24): DataFrame = {
    val n = emb.count()
    embeddingNearDupMultiprobe(emb, idCol, vecCol, threshold,
      hyperplanePool(bands, autoR(n, targetOccupancy, rMax), dim))
  }

  /** Corpus-size-adaptive banding: planes per band r = log2(n /
    * occupancy), so each band's expected bucket occupancy — and with it
    * the candidate volume — stays CONSTANT per row as the corpus grows
    * (candidates ~ bands · n · occupancy, i.e. LINEAR), instead of the
    * fixed-r config whose random-pair admission rate bands·2^-r turns
    * quadratic once n outgrows the bucket space (measured: the 4-bit
    * gate config grew 158x for 10x data in ScaleRehearsal).
    *
    * The trade is per-band recall p^r decaying as n grows — SRP-LSH
    * cannot hold BOTH linear candidates and flat recall at a low
    * threshold (p(sim=0.4)=0.63 vs p=0.5 for random pairs: the
    * separation (p/0.5)^r is the whole signal, and it is thin). At
    * near-dup thresholds worth the name (sim ≥ 0.8, p ≥ 0.8) the decay
    * is mild; for low-threshold similarity at scale, the partitioned
    * IVF index ([[ivfPublish]]/[[ivfKnnIndexed]]) is the right tool. */
  def embeddingNearDupAuto(emb: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, dim: Int, bands: Int = 8,
                           targetOccupancy: Int = 8, rMax: Int = 24): DataFrame = {
    val n = emb.count()
    embeddingNearDupBanded(emb, idCol, vecCol, threshold,
      hyperplanePool(bands, autoR(n, targetOccupancy, rMax), dim))
  }

  /** Adaptive planes-per-band: the smallest r with 2^r · occupancy ≥ n,
    * clamped to [4, rMax]. Integer search, not ceil(log2(n/occ)) — a
    * float log at a power-of-two boundary can flip the ceil between
    * engines, and the q_embdup_auto oracle must resolve the SAME r from
    * the same count with plain integer arithmetic. */
  def autoR(n: Long, targetOccupancy: Int, rMax: Int): Int =
    (4 to rMax).find(i => (1L << i) * targetOccupancy >= n).getOrElse(rMax)

  /** Per-band hyperplane pools: band b draws from its OWN seeded stream,
    * so a band's first r planes are a stable prefix as r grows with the
    * corpus — the property that lets q_embdup_auto's static oracle embed
    * rMax plane literals per band and mask `i < r` at query time while
    * the engine generates exactly r. (A single shared stream sliced into
    * contiguous bands would reassign every plane whenever r changes.) */
  def hyperplanePool(bands: Int, r: Int, dim: Int,
                     seed: Long = 42L): Seq[Seq[Seq[Double]]] =
    (0 until bands).map(b => hyperplanes(r, dim, seed + 1000L * (b + 1)))

  // ------------------------------------------------------------- IVF ANN
  /** Deterministic IVF centroids: an evenly-strided seeded sample of the
    * corpus itself (k-means-free — centroid quality matters less than
    * determinism for a reproducible index; swap in ml.clustering.KMeans
    * where recall targets demand it). Collected to the driver: nCells
    * vectors, not the corpus. */
  def ivfCentroids(emb: DataFrame, idCol: String, vecCol: String,
                   nCells: Int): Seq[(Int, Seq[Double])] = {
    val n = emb.count()
    val stride = math.max(1L, n / nCells)
    emb.select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
      .filter(pmod(col("id"), lit(stride)) === 0)
      .orderBy("id").limit(nCells)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toSeq) }.toSeq
  }

  /** Squared-distance argmin cell assignment: `least` over per-centroid
    * (dist², cell) structs — pure expressions, one pass, no shuffle.
    * dist²(v,c) = |v|² - 2·v·c + |c|²; |v|² is common to all cells so
    * only (-2·v·c + |c|²) is compared. */
  def ivfCell(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val scored = centroids.map { case (cid, c) =>
      val cn = c.map(x => x * x).sum
      struct((dotPortable(vec, typedLit(c)) * -2.0 + cn).as("score"),
        lit(cid).as("cid"))
    }
    // least() requires ≥2 args; a single-cell index assigns trivially
    if (scored.size == 1) lit(centroids.head._1)
    else least(scored: _*).getField("cid")
  }

  /** IVF ANN: assign every vector to its nearest centroid cell; a query
    * probes only its `nProbe` nearest cells, then exact-cosine ranks
    * within them. At 100 TB the assigned table is written partitioned by
    * `cell`, so a query reads nProbe/nCells of the data. */
  def ivfKnn(emb: DataFrame, idCol: String, vecCol: String,
             query: DataFrame, k: Int, nCells: Int, nProbe: Int): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    val cents = ivfCentroids(emb, idCol, vecCol, nCells)
    val assigned = emb.withColumn("cell", ivfCell(col(vecCol), cents))
    // One driver-side row: the query's probe cells.
    val qv = query.select(col("qv").cast("array<double>"))
      .collect()(0).getSeq[Double](0)
    val probeCells = cents
      .map { case (cid, c) =>
        val d = c.zip(qv).map { case (a, b) => a * b }.sum
        (cid, c.map(x => x * x).sum - 2.0 * d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    assigned.filter(col("cell").isin(probeCells: _*))
      .crossJoin(broadcast(query))
      .withColumn("sim", round(cosine(col(vecCol), col("qv")), 4))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .drop("qv", "cell")
  }

  /** Publish the IVF index on disk: the cell-assigned corpus written
    * `partitionBy("cell")`, so a probe reads only its nProbe cell
    * DIRECTORIES — at 100 TB this is the difference between scanning
    * the corpus per query and reading nProbe/nCells of it. Returns the
    * centroids for probe-time cell ranking (a real deployment persists
    * them next to the index; they are nCells rows, driver-sized by
    * construction). */
  def ivfPublish(emb: DataFrame, idCol: String, vecCol: String,
                 nCells: Int, dest: String): Seq[(Int, Seq[Double])] = {
    val cents = ivfCentroids(emb, idCol, vecCol, nCells)
    emb.withColumn("cell", ivfCell(col(vecCol), cents))
      .write.mode("overwrite").partitionBy("cell").parquet(dest)
    cents
  }

  /** Probe a published IVF index: rank cells against the query
    * driver-side (nCells dot products), then read ONLY the nProbe
    * nearest cell partitions — the `isin` lands in the scan's
    * PartitionFilters (IvfIndexSpec asserts the plan property) — and
    * exact-cosine rank within them. Same result contract as [[ivfKnn]]
    * over the same centroids. */
  /** The `nProbe` cells nearest a query vector (driver-side: nCells dot
    * products, nothing distributed to rank). */
  def ivfProbeCells(cents: Seq[(Int, Seq[Double])], qv: Seq[Double],
                    nProbe: Int): Seq[Int] = cents
    .map { case (cid, c) =>
      val d = c.zip(qv).map { case (a, b) => a * b }.sum
      (cid, c.map(x => x * x).sum - 2.0 * d)
    }
    .sortBy(_._2).take(nProbe).map(_._1)

  def ivfKnnIndexed(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                    cents: Seq[(Int, Seq[Double])], idCol: String,
                    vecCol: String, query: DataFrame, k: Int,
                    nProbe: Int): DataFrame = {
    graft.GraftExtensions.register(spark)
    val qv = query.select(col("qv").cast("array<double>"))
      .collect()(0).getSeq[Double](0)
    val probeCells = ivfProbeCells(cents, qv, nProbe)
    spark.read.parquet(indexDir)
      .filter(col("cell").isin(probeCells: _*))
      .crossJoin(broadcast(query))
      .withColumn("sim", round(cosine(col(vecCol), col("qv")), 4))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .drop("qv", "cell")
  }

  /** LSH-bucketed ANN: search only vectors sharing the query's SRP bucket,
    * then exact-cosine rank within the bucket. Recall < 1 by construction;
    * callers trade planes for recall. */
  def lshKnn(emb: DataFrame, idCol: String, vecCol: String,
             query: DataFrame, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    graft.GraftExtensions.register(emb.sparkSession)
    val planes = hyperplanes(nPlanes, dim)
    val bucketed = emb.withColumn("bucket", srpBucket(col(vecCol), planes))
    val q = query.withColumn("qbucket", srpBucket(col("qv"), planes))
    bucketed.join(broadcast(q), col("bucket") === col("qbucket"))
      .withColumn("sim", round(cosine(col(vecCol), col("qv")), 4))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .drop("qv", "qbucket")
  }

  /** One (query, candidate) row for [[mmrDiversified]]: `rel` must
    * already be the round(cosine, 4) relevance the upstream top-n
    * computed — the operator treats it as ground truth. */
  final case class MmrCand(qid: Long, cid: Long, rel: Double,
                           vec: Seq[Float])
  final case class MmrPick(qid: Long, rank: Int, cid: Long, score: Long)

  /** Maximal-marginal-relevance re-ranking: per query, greedily select
    * `k` of the gathered candidates maximizing
    * `λ·rel − (1−λ)·max_{s∈selected} cos(c, s)` — the diversified-
    * retrieval step that keeps a near-dup cluster from filling the
    * whole top-k (retrieval-augmented sampling, eval-set construction).
    *
    * Scale shape: the EXPENSIVE part (corpus-wide top-n gather) happens
    * upstream on the distributed path (brute/IVF/int8 knn); this
    * operator then works per query on n ≤ a few dozen candidates — a
    * mapGroups over the query key whose per-group cost is O(k·n)
    * 64-dim dots, pennies next to the gather. Nothing here touches the
    * corpus again.
    *
    * Engine parity discipline: λ is the RATIONAL lamNum/lamDen, every
    * similarity becomes an integer (its 4-decimal rounding × 10⁴), and
    * the comparison key is the INTEGER `lamNum·R − (lamNum−…)`… i.e.
    * `score = lamNum·R − (lamDen−lamNum)·M` over the implicit
    * denominator lamDen·10⁴. A double score of the textbook form sits
    * arbitrarily close to rounding boundaries where Spark's
    * (BigDecimal.valueOf) and DuckDB's (x·10⁴ then half-away) round()
    * genuinely disagree — measured on this corpus at 0.21385 — so the
    * greedy key must never round a float. Ties break by candidate id.
    * The returned `score` is that scaled integer. */
  def mmrDiversified(cands: DataFrame, k: Int,
                     lamNum: Int, lamDen: Int): DataFrame = {
    require(lamNum > 0 && lamDen > lamNum,
      s"need 0 < lamNum < lamDen (0 < lambda < 1); got $lamNum/$lamDen")
    import cands.sparkSession.implicits._
    val muNum = lamDen - lamNum
    cands.select(col("qid"), col("cid"), col("rel"), col("vec"))
      .as[MmrCand]
      .groupByKey(_.qid)
      .flatMapGroups { (qid: Long, it: Iterator[MmrCand]) =>
        val pool = collection.mutable.ArrayBuffer.from(it)
        val selected = collection.mutable.ArrayBuffer.empty[MmrCand]
        val out = collection.mutable.ArrayBuffer.empty[MmrPick]
        var rank = 1
        while (rank <= k && pool.nonEmpty) {
          var bi = -1
          var bestScore = 0L
          var bestId = 0L
          var i = 0
          while (i < pool.length) {
            val c = pool(i)
            val r = scaled4(c.rel)
            val score =
              if (selected.isEmpty) lamNum * r
              else {
                var ms = Long.MinValue
                selected.foreach { s =>
                  val v = scaled4(r4(cosScalar(c.vec, s.vec)))
                  if (v > ms) ms = v
                }
                lamNum * r - muNum * ms
              }
            if (bi < 0 || score > bestScore ||
                (score == bestScore && c.cid < bestId)) {
              bi = i; bestScore = score; bestId = c.cid
            }
            i += 1
          }
          val pick = pool.remove(bi)
          selected += pick
          out += MmrPick(qid, rank, pick.cid, bestScore)
          rank += 1
        }
        out.iterator
      }
      .toDF("qid", "rank", "cid", "score")
  }

  /** A 4-decimal-rounded double as its exact ×10⁴ integer. */
  private def scaled4(x: Double): Long = math.round(x * 10000.0)

  /** Scalar twin of the `array_dot` kernel: left-to-right double fold
    * over per-element double products — bit-identical to the column
    * form and to the oracle's list_reduce replay. */
  /** Seed-derived ±1 Johnson–Lindenstrauss sign matrix (dOut rows of
    * dIn signs), driver-built from the same sha-parity rule the oracle
    * replays in SQL: sign(j, i) = +1 iff the first 8 hex chars of
    * sha256("seed#j#i") are even as an integer (TextFunctions
    * .shaHash32 parity). Achlioptas (2003) showed ±1 entries satisfy
    * the JL lemma like Gaussian ones — and ±1 keeps the projection in
    * exact BIGINT arithmetic, which is what makes the operator
    * hash-gateable at all. The matrix is seed-only data (dOut·dIn
    * longs, never corpus-sized), so it ships as a plan LITERAL: zero
    * shuffle, zero per-row hashing. */
  def jlSignMatrix(dIn: Int, dOut: Int, seed: String): Array[Array[Long]] = {
    require(dIn >= 1 && dOut >= 1, s"need dIn, dOut >= 1; got $dIn/$dOut")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    Array.tabulate(dOut, dIn) { (j, i) =>
      val h = md.digest(s"$seed#$j#$i".getBytes("UTF-8"))
        .take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      if (h % 2 == 0) 1L else -1L
    }
  }

  /** Johnson–Lindenstrauss dimensionality reduction for an embedding
    * column: project dIn float dims onto dOut signed-sum dims. This is
    * the 100 TB ANN *preprocessing* step the IVF/PQ/int8 operators sit
    * behind — at 768→64 dims the embedding bytes crossing every
    * downstream shuffle, index build, and distance kernel shrink 12×,
    * while JL keeps relative distances within (1±ε) whp
    * (JlProjectionSpec measures the retained neighbor recall rather
    * than assuming the lemma).
    *
    * Execution shape: ONE codegen'd scan stage — fixed-point the
    * vector once (`round(v·scale)` per element, staged as its own
    * attribute — the averageHashStaged lesson), then one native
    * `array_dot` call per output dim against the literal sign row.
    * The dot runs in DOUBLE but stays exact: every operand is an
    * integral double (|value| ≤ scale·10, |sum| ≤ dIn·scale·10 ≪
    * 2^53), so the BIGINT cast loses nothing and the DuckDB oracle's
    * integer replay matches bit-for-bit. Measured against the
    * portable zip_with/aggregate fold at sf0.1: 0.35 s vs 1.8 s for
    * the projection pass — higher-order lambdas evaluate
    * interpretively per element, the kernel is one JIT'd loop (the
    * same 5× that motivated array_dot for cosine). No shuffle, no
    * UDF, no driver data pass.
    *
    * @return input plus `projCol`: array<long> of length dOut, where
    *         proj[j] = Σ_i sign(j,i) · round(vec[i] · scale). */
  def projectSigned(df: DataFrame, vecCol: String, dIn: Int, dOut: Int,
                    seed: String, projCol: String = "proj",
                    scale: Long = 10000L): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession) // standalone sessions
    // The output array is UNROLLED into dOut explicit array_dot calls
    // rather than transform(signMatrixLiteral, srow => dot(fixed, srow)).
    // Not style: the outer-transform form references the staged fixed
    // column exactly ONCE at top level, so CollapseProject inlines it
    // into the lambda when a caller drops it — and the HOF runtime then
    // re-evaluates the whole fixed-point transform per OUTPUT DIM
    // (measured: 1.4 s vs 0.3 s at sf0.1, the third incarnation of the
    // averageHashStaged lesson). dOut top-level references make the
    // alias multi-referenced, which CollapseProject refuses to inline.
    val sRows = jlSignMatrix(dIn, dOut, seed)
      .map(r => typedlit(r.map(_.toDouble)))
    df.withColumn("__jl_fixed",
        transform(col(vecCol), v => round(v.cast("double") * scale)))
      .withColumn(projCol, array(sRows.map(r =>
        call_function("array_dot", col("__jl_fixed"), r).cast("long")): _*))
      .drop("__jl_fixed")
  }

  /** Squared L2 distance between two projected BIGINT vectors — the
    * exact integer metric JL-space candidate search ranks by. */
  def projL2Sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  private def dotScalar(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  private def cosScalar(a: Seq[Float], b: Seq[Float]): Double =
    dotScalar(a, b) / (math.sqrt(dotScalar(a, a)) * math.sqrt(dotScalar(b, b)))

  /** round(x, 4) with Spark/DuckDB round() semantics: BigDecimal
    * .valueOf (Double.toString shortest-decimal) then HALF_UP — exactly
    * what Catalyst's Round does for doubles. An exact-binary-expansion
    * BigDecimal would round 0.3131 (stored as …30999…) DOWN where both
    * engines round it up. */
  private def r4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
}
