package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

class PqSpec extends SparkSpec {
  import spark.implicits._

  // Four distinct dim-8 patterns, pattern = id % 4 over ids 0..19: the
  // strided init (n=20, k=4 → stride 5 → ids 0,5,10,15) picks patterns
  // 0,1,2,3 — one of each — and every Lloyd cluster's mean is its own
  // point, so the codebooks converge to the patterns EXACTLY; ADC then
  // IS the true quantized distance and every assertion is closed-form.
  private val patterns = Seq(
    Seq(1f, 0f, 0f, 0f, 2f, 0f, 0f, 0f),
    Seq(0f, 1f, 0f, 0f, 0f, 2f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f, 0f, 0f, 2f, 0f),
    Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 2f))

  private def corpus = (0 until 20).map { id =>
    (id.toLong, patterns(id % 4), (id % 4).toLong)
  }.toDF("vec_id", "embedding", "label")

  test("codebooks converge to the exact patterns and codes are in range") {
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, k = 4, iters = 2)
    assert(cb.m === 2 && cb.k === 4 && cb.subDim === 4)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size === 20)
    assert(codes.values.forall(c => c.length == 2 && c.forall(x => x >= 0 && x < 4)))
    // identical vectors encode identically
    val byPattern = codes.groupBy { case (id, _) => id % 4 }
      .view.mapValues(_.values.toSet).toMap
    assert(byPattern.values.forall(_.size === 1),
      s"same pattern must share one code, got $byPattern")
  }

  test("fused one-pass train matches the per-subspace kmeansFit composition") {
    // r17: train runs all m subspaces in one distributed pass per Lloyd
    // round; the codebooks must equal the sequential per-slice kmeansFit
    // form bit-for-bit (same strided init, same argmin, same update sums).
    // Non-converging config (iters = 1 on a mixed corpus) so mid-Lloyd
    // state is compared, not just the fixed point.
    val m = 2
    val subDim = 4
    for (iters <- Seq(1, 2)) {
      val fused = Pq.train(corpus, "vec_id", "embedding", m, k = 4, iters)
      val seq = (0 until m).map { j =>
        Clustering.kmeansFit(
          corpus.select(col("vec_id"),
            slice(col("embedding"), j * subDim + 1, subDim).as("__sub")),
          "vec_id", "__sub", k = 4, iters)
      }.toIndexedSeq
      assert(fused.cents === seq, s"iters=$iters")
    }
  }

  test("ADC against centroid-aligned data is the true quantized distance") {
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, k = 4, iters = 2)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb, carry = Seq("label"))
    val qv = Pq.quantizedQuery(corpus.filter(col("vec_id") === 0), "embedding")
    val top = Pq.knnAdc(codes, cb, qv, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // the 5 copies of pattern 0 are at distance 0, and come first by id
    assert(top.take(5).map(_._1).toSeq === Seq(0L, 4L, 8L, 12L, 16L))
    assert(top.take(5).forall(_._2 === 0.0 +- 1e-9))
    // every other row's ADC = exact |q - x|² in the 1e6-quantized grid:
    // patterns differ in 4 positions (a 1 and a 2 on each side) →
    // 2·(1e6)² + 2·(2e6)²
    val expect = 2.0 * (1e12 + 4e12)
    assert(top.drop(5).forall(t => t._2 === expect +- 1e-3),
      s"got ${top.drop(5).take(3).mkString(",")}")
  }

  test("ADC ranking agrees with brute-force cosine top-1 on separated data") {
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, k = 4, iters = 2)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb)
    val q = corpus.filter(col("vec_id") === 7) // pattern 3
      .select(col("embedding").as("qv"))
    val brute = Similarity.bruteForceKnn(corpus, "vec_id", "embedding", q, 1)
      .collect().head.getLong(0)
    val adc = Pq.knnAdc(codes, cb,
      Pq.quantizedQuery(corpus.filter(col("vec_id") === 7), "embedding"), 1)
      .collect().head.getLong(0)
    assert(adc === brute)
  }

  test("dimension must divide into m subspaces") {
    intercept[IllegalArgumentException] {
      Pq.train(corpus, "vec_id", "embedding", m = 3, k = 2, iters = 1)
    }
  }
}

class IvfPqSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // same centroid-aligned fixture as PqSpec: pattern = id % 4, ids 0..19
  private val patterns = Seq(
    Seq(1f, 0f, 0f, 0f, 2f, 0f, 0f, 0f),
    Seq(0f, 1f, 0f, 0f, 0f, 2f, 0f, 0f),
    Seq(0f, 0f, 1f, 0f, 0f, 0f, 2f, 0f),
    Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 2f))
  private def corpus = (0 until 20).map { id =>
    (id.toLong, patterns(id % 4), (id % 4).toLong)
  }.toDF("vec_id", "embedding", "label")

  test("nProbe = nCells reduces to plain ADC over all codes") {
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, k = 4, iters = 2)
    val q = corpus.filter(col("vec_id") === 5)
    val full = Pq.knnAdc(
      Pq.encode(corpus, "vec_id", "embedding", cb),
      cb, Pq.quantizedQuery(q, "embedding"), 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Pq.ivfPqKnn(corpus, "vec_id", "embedding", cb, q, 8,
        nCells = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf === full)
  }

  test("probed search finds the query's own pattern copies first") {
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, k = 4, iters = 2)
    val q = corpus.filter(col("vec_id") === 2) // pattern 2
    val top = Pq.ivfPqKnn(corpus, "vec_id", "embedding", cb, q, 5,
        nCells = 4, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top === Set(2L, 6L, 10L, 14L, 18L),
      s"expected the five pattern-2 rows, got $top")
  }

  test("shortlist + exact re-rank: full coverage reduces to brute force; floats decide the order") {
    val cb = Pq.train(corpus, "vec_id", "embedding", m = 2, k = 4, iters = 2)
    val q = corpus.filter(col("vec_id") === 2)
    // nProbe = nCells and shortlist = corpus: stage 1 prunes nothing,
    // so the result IS exact brute-force cosine — the identity that
    // pins the composition's semantics
    val rr = Pq.ivfPqKnnRerank(corpus, "vec_id", "embedding", cb, q,
        k = 8, nCells = 4, nProbe = 4, shortlist = 20)
      .select("vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.bruteForceKnn(corpus, "vec_id", "embedding",
        q.select(col("embedding").as("qv")), 8)
      .select("vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rr === brute)
    // the exact-cosine stage ranks the query's own pattern first even
    // when the shortlist is ADC-ordered
    assert(rr.take(5).map(_._1).toSet === Set(2L, 6L, 10L, 14L, 18L))
    // a shortlist narrower than k refuses
    intercept[IllegalArgumentException] {
      Pq.ivfPqKnnRerank(corpus, "vec_id", "embedding", cb, q,
        k = 8, nCells = 4, nProbe = 4, shortlist = 5)
    }
    ()
  }

  test("published IVF-PQ index: probe prunes to nProbe cell partitions, re-rank matches in-memory") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
    val cb = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val q = emb.filter(col("vec_id") === 7)
    val dest =
      java.nio.file.Files.createTempDirectory("graft_ivfpq_idx_").toString
    val cents = Pq.ivfPqPublish(emb, "vec_id", "embedding", cb, 8, dest)
    val probed = Pq.ivfPqKnnIndexedRerank(spark, dest, cents, cb, emb,
      "vec_id", "embedding", q, k = 10, nProbe = 3, shortlist = 50)
    // plan property: the probe cells land in the CODES scan's
    // PartitionFilters — the index read is directory-pruned
    val plan = probed.queryExecution.executedPlan.toString
    // two scans in this plan: the raw corpus (unpartitioned — empty
    // filters) and the CODES index; the cells must land on the latter
    val pfs = "PartitionFilters: \\[[^\\]]*\\]".r.findAllIn(plan).toSeq
    assert(pfs.exists(_.contains("cell")),
      s"probe cells must reach the codes scan's PartitionFilters, got '$pfs':\n$plan")
    // result contract: identical to the in-memory composition over the
    // same centroids (ivfCentroids is deterministic) and codebook
    val mem = Pq.ivfPqKnnRerank(emb, "vec_id", "embedding", cb, q,
      k = 10, nCells = 8, nProbe = 3, shortlist = 50)
    assert(rows(probed.select("vec_id", "sim").orderBy(col("sim").desc,
        col("vec_id"))) ===
      rows(mem.select("vec_id", "sim").orderBy(col("sim").desc,
        col("vec_id"))))
    ()
  }

  test("incremental index growth: appended vectors are probed without a rebuild") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
    val cb = Pq.train(emb, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val q = emb.filter(col("vec_id") === 7)
    val dest =
      java.nio.file.Files.createTempDirectory("graft_ivfpq_incr_").toString
    val cents = Pq.ivfPqPublish(emb, "vec_id", "embedding", cb, 8, dest)
    // the delta: the query's OWN vector under a fresh id — it must
    // land in the query's probe cell and dominate the re-rank
    val delta = q.select((col("vec_id") + 1000000L).as("vec_id"),
      col("label"), col("embedding"))
    Pq.ivfPqAppend(delta, "vec_id", "embedding", cb, cents, dest)
    val probed = Pq.ivfPqKnnIndexedRerank(spark, dest, cents, cb,
      emb.unionByName(delta), "vec_id", "embedding", q,
      k = 2, nProbe = 1, shortlist = 10)
      .select("vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // both copies of the query vector found at sim 1.0, lowest id first
    assert(probed === Seq((7L, 1.0), (1000007L, 1.0)), probed.toString)
    ()
  }
}
