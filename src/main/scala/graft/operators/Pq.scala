package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou/Douze/Schmid, "Product Quantization
  * for Nearest Neighbor Search", IEEE PAMI 2011) — the memory-compression
  * leg of the classic large-scale ANN stack (alongside the IVF routing
  * index, [[Similarity.ivfPublish]], and the int8 scalar path,
  * [[Similarity.knnInt8]]): split each vector into `m` subvectors, learn
  * a small k-means codebook PER subspace, and store each vector as m
  * centroid ids. At dim 64 / m 4 / k ≤ 256 that is 4 bytes per vector
  * instead of 256 — the difference between an embedding store that fits
  * executor memory and one that doesn't.
  *
  * Query answers by ASYMMETRIC distance (ADC): the full-precision query
  * precomputes a (m × k) lookup table of subspace distances ON THE
  * DRIVER, and each stored vector's approximate distance is m table
  * lookups + (m−1) adds — a scan-stage expression over the codes column,
  * no per-row vector arithmetic at all.
  *
  * Exactness discipline (the [[Clustering]] convention): all training and
  * all distances run in the round(x·10⁶) quantized-long double image, the
  * per-subspace Lloyd is [[Clustering.kmeansFit]] verbatim (strided init,
  * (cost, cid) argmin tie-break), and every float fold is left-to-right
  * in position order — so the DuckDB oracle replays codebooks, codes and
  * ADC distances bit-for-bit (gate: q_knn_pq).
  *
  * Scale shape: training scans the corpus m·(iters+1) times but a 100 TB
  * run fits codebooks on a bounded [[Similarity.hashStratum]] sample (the
  * kmeansFit deployment pattern) — the full corpus pays only the ONE
  * encode pass (pure scan-stage expressions), and the published codes
  * table is what queries touch from then on. Top-k is sort+limit →
  * TakeOrderedAndProject, never a global sort.
  */
object Pq {

  /** Per-subspace codebooks in the quantized-double image:
    * `cents(j)(cid)` is subspace j's centroid `cid` (subDim doubles). */
  case class Codebook(subDim: Int, cents: IndexedSeq[IndexedSeq[Seq[Double]]]) {
    def m: Int = cents.size
    def k: Int = cents.head.size
  }

  /** Train m codebooks of k centroids each with `iters` Lloyd rounds —
    * [[Clustering.kmeansFit]]'s arithmetic per subvector slice. dim must
    * divide evenly (a real deployment pads; the loud require documents
    * it).
    *
    * r17 scale/latency shape: all m subspaces train in ONE distributed
    * pass per Lloyd round — each row emits m (subspace, cell, sliced-q)
    * structs and one map-side-combined groupBy(j, cell, pos) carries
    * every codebook's update sums (m·k·subDim bounded driver rows, the
    * kmeansFit contract per subspace). The per-subspace sequential form
    * scanned the corpus m·(iters+1) times and paid m counts + m init
    * collects; this pays ONE persist/count/init and `iters` jobs total.
    * Bit-identical to the sequential form: quantize-then-slice equals
    * slice-then-quantize, the strided init rows are the same k rows
    * sliced driver-side, and the argmin/update arithmetic is
    * [[Similarity.ivfCell]]'s literal fold exactly as kmeansFit's
    * literal path (k ≤ 64, its literalCap) — PqSpec pins codebooks on
    * both shapes. Above the literal cap the broadcast-argmin kmeansFit
    * path takes over, unchanged. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            m: Int, k: Int, iters: Int): Codebook = {
    require(m > 0, s"m must be positive, got $m")
    // Bounded driver read: one row — the dimensionality.
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m subspaces")
    val subDim = dim / m
    if (k > 64) { // kmeansFit's literalCap: keep its broadcast path
      val cents = (0 until m).map { j =>
        Clustering.kmeansFit(
          emb.select(col(idCol),
            slice(col(vecCol), j * subDim + 1, subDim).as("__sub")),
          idCol, "__sub", k, iters)
      }.toIndexedSeq
      return Codebook(subDim, cents)
    }
    require(iters >= 0, s"iters must be non-negative, got $iters")
    val v = emb.select(col(idCol).cast("long").as("id"),
        Clustering.quantize(col(vecCol)).as("q"))
      .withColumn("vd", transform(col("q"), x => x.cast("double")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = v.count()
      require(n >= k, s"need at least k=$k vectors, have $n")
      val stride = math.max(1L, n / k)
      val initRows = v.filter(pmod(col("id"), lit(stride)) === 0)
        .orderBy("id").limit(k)
        .collect().map(_.getSeq[Double](2).toIndexedSeq).toIndexedSeq
      var cents: IndexedSeq[IndexedSeq[Seq[Double]]] = (0 until m).map { j =>
        initRows.map(r => r.slice(j * subDim, (j + 1) * subDim): Seq[Double])
      }.toIndexedSeq
      for (_ <- 1 to iters) {
        val parts = (0 until m).map { j =>
          val cell = Similarity.ivfCell(
            slice(col("vd"), j * subDim + 1, subDim),
            cents(j).zipWithIndex.map { case (c, i) => (i, c) })
          struct(lit(j).as("j"), cell.as("cell"),
            slice(col("q"), j * subDim + 1, subDim).as("qs"))
        }
        val upd = v.select(explode(array(parts: _*)).as("s"))
          .select(col("s.j").as("j"), col("s.cell").as("cell"),
            posexplode(col("s.qs")).as(Seq("pos", "x")))
          .groupBy(col("j"), col("cell"), col("pos"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("cnt"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
        cents = cents.zipWithIndex.map { case (cbj, j) =>
          cbj.zipWithIndex.map { case (prev, cid) =>
            upd.get((j, cid)) match {
              case Some(rows) =>
                rows.sortBy(_.getInt(2)).map(r =>
                  r.getLong(3).toDouble / r.getLong(4)).toSeq
              case None => prev
            }
          }
        }
      }
      Codebook(subDim, cents)
    } finally { v.unpersist(); () }
  }

  /** (id, carry..., code): each vector's m-array of subspace centroid
    * ids — ONE scan-stage pass ([[Similarity.ivfCell]]'s literal argmin
    * per subspace; quantize-then-slice equals slice-then-quantize, so
    * codes live in exactly the codebook's arithmetic). `carry` columns
    * ride along untouched (label, partition keys). */
  def encode(emb: DataFrame, idCol: String, vecCol: String, cb: Codebook,
             carry: Seq[String] = Nil): DataFrame = {
    val vd = transform(Clustering.quantize(col(vecCol)), x => x.cast("double"))
    val codes = array((0 until cb.m).map { j =>
      Similarity.ivfCell(
        slice(vd, j * cb.subDim + 1, cb.subDim),
        cb.cents(j).zipWithIndex.map { case (c, i) => (i, c) })
    }: _*)
    emb.select((col(idCol).cast("long").as("id") +: carry.map(col)) :+
      codes.as("code"): _*)
  }

  /** ADC top-k: the query's (m × k) LUT of quantized squared distances
    * is built on the driver (left-to-right position fold, the shared
    * float discipline) and embedded as plan literals; each row's
    * distance is m element_at lookups summed j = 0..m−1. Returns the k
    * nearest codes rows with `adist` (rounded 4, the gate float
    * convention); ordering ties break on id. */
  def knnAdc(codes: DataFrame, cb: Codebook, queryVec: Seq[Double],
             topK: Int): DataFrame = {
    require(queryVec.size == cb.m * cb.subDim,
      s"query dim ${queryVec.size} != ${cb.m}x${cb.subDim}")
    val luts: IndexedSeq[Seq[Double]] = (0 until cb.m).map { j =>
      val qj = queryVec.slice(j * cb.subDim, (j + 1) * cb.subDim)
      cb.cents(j).map { c =>
        (0 until cb.subDim).foldLeft(0.0) { (acc, i) =>
          acc + (qj(i) - c(i)) * (qj(i) - c(i))
        }
      }
    }
    val dist = (0 until cb.m).map { j =>
      element_at(typedLit(luts(j)), element_at(col("code"), j + 1) + 1)
    }.reduce(_ + _)
    codes.withColumn("__adist", dist)
      .orderBy(col("__adist"), col("id"))
      .limit(topK)
      .withColumn("adist", round(col("__adist"), 4))
      .drop("__adist", "code")
  }

  /** IVF-PQ: the full FAISS-style composition — coarse IVF routing
    * ([[Similarity.ivfCentroids]]/[[Similarity.ivfCell]]) narrows the
    * search to the query's `nProbe` nearest cells, and ranking INSIDE
    * the probed cells runs on the PQ codes by ADC. At 100 TB this is
    * the deployable read path: the codes table is written partitioned
    * by cell (the [[Similarity.ivfPublish]] layout at 1/64th the bytes),
    * a query reads nProbe/nCells of an already-64x-compressed index,
    * and per-row work is m lookups. Recall < 1 twice over (cell routing
    * AND code quantization) — PqSpec pins agreement with brute force on
    * separated data and the nProbe = nCells ≡ plain-ADC identity. */
  def ivfPqKnn(emb: DataFrame, idCol: String, vecCol: String, cb: Codebook,
               query: DataFrame, k: Int, nCells: Int, nProbe: Int,
               carry: Seq[String] = Nil): DataFrame = {
    val cents = Similarity.ivfCentroids(emb, idCol, vecCol, nCells)
    val qvRaw = query.select(col(vecCol).cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val probe = Similarity.ivfProbeCells(cents, qvRaw, nProbe)
    val withCell = emb.withColumn("__cell",
      Similarity.ivfCell(col(vecCol), cents))
    val codes = encode(withCell, idCol, vecCol, cb, carry = carry :+ "__cell")
    knnAdc(codes.filter(col("__cell").isin(probe: _*)), cb,
        quantizedQuery(query, vecCol), k)
      .drop("__cell")
  }

  /** IVF-PQ SHORTLIST → EXACT RE-RANK: the deployable read path that
    * closes most of the quantization recall gap for the price of
    * `shortlist` full-precision rows. Stage 1 is [[ivfPqKnn]] at
    * k = `shortlist` — coarse IVF routing to `nProbe` cells, ADC over
    * the codes (the 64×-compressed index is ALL that's scanned). Stage
    * 2 fetches the shortlist's full vectors (a broadcast semi-join:
    * the shortlist is driver-small by construction) and ranks them by
    * EXACT cosine — compression prunes, floats decide (the PQ
    * shortlist→re-rank shape from the annrecall scorecard, composed
    * with IVF routing). At 100 TB: per query, codes of nProbe/nCells
    * of the corpus + `shortlist` raw vectors read — never the corpus.
    * Recall is bounded above by IVF's cell routing (a true neighbor in
    * an unprobed cell is gone before ADC sees it) and below by plain
    * IVF-PQ (re-ranking can only fix ADC's ordering, not its
    * candidacy). */
  def ivfPqKnnRerank(emb: DataFrame, idCol: String, vecCol: String,
                     cb: Codebook, query: DataFrame, k: Int, nCells: Int,
                     nProbe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val short = ivfPqKnn(emb, idCol, vecCol, cb, query, shortlist,
      nCells, nProbe).select(col("id").as(idCol))
    val cand = emb.join(broadcast(short), Seq(idCol), "left_semi")
    Similarity.bruteForceKnn(cand, idCol, vecCol,
      query.select(col(vecCol).as("qv")), k)
  }

  /** Publish the IVF-PQ index ON DISK: the encoded codes table written
    * `partitionBy("cell")` — [[Similarity.ivfPublish]]'s layout at
    * ~1/64th the bytes (m code bytes per vector instead of the raw
    * floats). A probe reads only its nProbe cell DIRECTORIES of an
    * already-compressed index; at 100 TB this is the deployable ANN
    * read path end to end. Returns the centroids for probe-time cell
    * ranking (nCells rows, driver-sized by construction; a real
    * deployment persists them — and the codebook — next to the
    * index). */
  def ivfPqPublish(emb: DataFrame, idCol: String, vecCol: String,
                   cb: Codebook, nCells: Int, dest: String,
                   carry: Seq[String] = Nil): Seq[(Int, Seq[Double])] = {
    val cents = Similarity.ivfCentroids(emb, idCol, vecCol, nCells)
    val withCell = emb.withColumn("cell",
      Similarity.ivfCell(col(vecCol), cents))
    encode(withCell, idCol, vecCol, cb, carry = carry :+ "cell")
      .write.mode("overwrite").partitionBy("cell").parquet(dest)
    cents
  }

  /** APPEND a delta of new vectors into a published IVF-PQ index —
    * incremental index growth (the embedding store's everyday shape:
    * the corpus grows, the index must not rebuild). The delta encodes
    * against the SAME centroids and codebook the index was published
    * with (cells and codes are pure functions of them, so old and new
    * rows live in one consistent geometry) and lands as new files
    * inside the existing cell directories — O(delta) encode + write,
    * zero existing bytes touched, the partition layout and every
    * probe's directory pruning unchanged. Re-train and re-publish when
    * drift makes the frozen centroids a bad router (the same contract
    * as every frozen-codebook ANN deployment). */
  def ivfPqAppend(delta: DataFrame, idCol: String, vecCol: String,
                  cb: Codebook, cents: Seq[(Int, Seq[Double])],
                  dest: String, carry: Seq[String] = Nil): Unit = {
    val withCell = delta.withColumn("cell",
      Similarity.ivfCell(col(vecCol), cents))
    encode(withCell, idCol, vecCol, cb, carry = carry :+ "cell")
      .write.mode("append").partitionBy("cell").parquet(dest)
  }

  /** Probe a published IVF-PQ index and EXACT-RE-RANK the shortlist:
    * cells rank driver-side (nCells dot products), the codes scan
    * reads ONLY the nProbe nearest cell partitions (the `isin` lands
    * in the scan's PartitionFilters — IvfPqSpec asserts the plan
    * property), ADC shortlists inside them, and the shortlist's full
    * vectors (a broadcast semi-join against the raw corpus) rank by
    * exact cosine. Same result contract as [[ivfPqKnnRerank]] over the
    * same centroids/codebook. Per query: nProbe/nCells of the CODES
    * bytes + `shortlist` raw vectors — never the corpus. */
  def ivfPqKnnIndexedRerank(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String, cents: Seq[(Int, Seq[Double])],
                            cb: Codebook, emb: DataFrame, idCol: String,
                            vecCol: String, query: DataFrame, k: Int,
                            nProbe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    val qvRaw = query.select(col(vecCol).cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val probe = Similarity.ivfProbeCells(cents, qvRaw, nProbe)
    val codes = spark.read.parquet(indexDir)
      .filter(col("cell").isin(probe: _*))
    val short = knnAdc(codes, cb, quantizedQuery(query, vecCol), shortlist)
      .select(col("id").as(idCol))
    val cand = emb.join(broadcast(short), Seq(idCol), "left_semi")
    Similarity.bruteForceKnn(cand, idCol, vecCol,
      query.select(col(vecCol).as("qv")), k)
  }

  /** The query's quantized-double image via the engine's own round —
    * ONE bounded driver row; keeps driver arithmetic out of the parity
    * surface entirely. */
  def quantizedQuery(query: DataFrame, vecCol: String): Seq[Double] =
    query.select(transform(Clustering.quantize(col(vecCol)),
        x => x.cast("double")).as("qd"))
      .head().getSeq[Double](0).toSeq
}
