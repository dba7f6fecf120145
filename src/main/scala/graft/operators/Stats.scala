package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered statistics per group — the data-profiling step of a curation
  * pipeline (score distributions per source, length percentiles per
  * language, price spreads per class).
  *
  * Two shapes, one contract, same dual pattern as simhash32/64:
  *
  *  - [[exactQuantiles]]: discrete quantiles by RANK ARITHMETIC — the
  *    value at row_number ceil(p·n) in (value, then value-identical tie)
  *    order. Engine-portable by construction: rank positions are integer
  *    math and the picked VALUE is unique even when the tied row identity
  *    is not, so any ANSI engine (the DuckDB gate included) reproduces it
  *    bit-for-bit. Cost: one window shuffle on the group key — the group
  *    aggregation after it reuses the same partitioning, so the plan has
  *    exactly ONE Exchange.
  *  - [[approxQuantiles]]: `approx_percentile` (Greenwald–Khanna
  *    sketch), the 100 TB shape — a single partial-aggregation pass, no
  *    per-group sort, mergeable across 1000 executors. Engine-internal
  *    (sketches have no cross-engine twin); StatsSpec pins it to the
  *    exact operator within the sketch's rank-error bound rather than by
  *    hash.
  *
  * At gate scale both run in milliseconds; at corpus scale the exact
  * variant's window sort is the bottleneck and the sketch is the one to
  * deploy — same "oracle-checkable config vs deployable config" split
  * the rest of the engine uses.
  */
object Stats {
  /** (group, p«NN»…) — one row per group, one column per requested
    * quantile. `ps` are (0,1] fractions; column name p50 ⇔ 0.50. */
  def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantile fractions must lie in (0, 1], got $ps")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
    val wAll = Window.partitionBy(col(groupCol))
    // Order statistics are over the NON-NULL values (the convention every
    // quantile function shares). Without this filter Spark ranks nulls
    // FIRST while an oracle engine's default is NULLS LAST — shifted
    // ranks, and a pick landing on the null row would return null.
    val ranked = df.select(col(groupCol), col(valCol))
      .filter(col(valCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
    val picks = ps.map { p =>
      // rank ceil(p·n): n·p is exact IEEE for n < 2^53, identical in any
      // engine; max(when…) collapses the one hit per group (ties share a
      // value, so the pick is well-defined even with arbitrary rn order)
      max(when(col("__rn") === ceil(col("__n") * lit(p)), col(valCol)))
        .as(colName(p))
    }
    ranked.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
  }

  /** Sketch-based quantiles, single partial-agg pass (the deployable
    * shape). `accuracy` is approx_percentile's 1/rank-error knob. */
  def approxQuantiles(df: DataFrame, groupCol: String, valCol: String,
                      ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val arr = array(ps.map(lit): _*)
    df.groupBy(col(groupCol))
      .agg(approx_percentile(col(valCol), arr, lit(accuracy)).as("__q"))
      .select(col(groupCol) +:
        ps.zipWithIndex.map { case (p, i) =>
          element_at(col("__q"), i + 1).as(colName(p))
        }: _*)
  }

  private def colName(p: Double): String = {
    val pct = p * 100
    if (pct == pct.round.toDouble) s"p${pct.round}" else s"p${(p * 1000).round}"
  }

  /** Fixed-width histogram per group: bin = floor((v - lo) / width),
    * with explicit underflow (-1) / overflow (`nBins`) edge bins so no
    * row silently disappears. Pure scan-stage arithmetic (an IEEE
    * subtract/divide/floor every engine replays bit-for-bit) + ONE
    * partial-aggregated groupBy — the profiling pass that costs a
    * single map-side-combined shuffle no matter the corpus size. NULLs
    * are excluded, same convention as [[exactQuantiles]]. */
  def histogram(df: DataFrame, groupCol: String, valCol: String,
                lo: Double, width: Double, nBins: Int): DataFrame = {
    require(width > 0 && nBins > 0, s"need width>0, nBins>0; got $width/$nBins")
    val v = col(valCol).cast("double")
    val bin = when(v < lo, lit(-1L))
      .when(v >= lo + nBins * width, lit(nBins.toLong))
      .otherwise(floor((v - lo) / width))
    df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), bin.as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group approximate distinct count (HyperLogLog++) — the
    * cardinality-profiling twin of [[approxQuantiles]]: one mergeable
    * sketch pass instead of the exact `count(DISTINCT …)` whose
    * de-duplicating shuffle carries every distinct value. `rsd` is the
    * relative standard deviation; StatsSpec pins the estimate to the
    * exact count within a multiple of it. Engine-internal (sketches
    * have no cross-engine oracle); the exact distinct is already gated
    * via q_groupcount. */
  def approxDistinct(df: DataFrame, groupCol: String, valCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valCol), rsd).as("n_distinct"))

  /** Misra–Gries heavy hitters: every value with frequency > n/(k+1),
    * in ONE pass with a k-entry summary per partition and NO shuffle at
    * all — the deployable twin of q_vocab's exact top-K (whose groupBy
    * shuffles the whole vocabulary and whose exactness a 100 TB token
    * stream doesn't need for stopword/df-cap decisions).
    *
    * Contract (Misra–Gries + mergeability, Agarwal et al., "Mergeable
    * Summaries", PODS'12): returned counts UNDERESTIMATE true frequency
    * by at most n/(k+1); any value with true frequency above n/(k+1) is
    * guaranteed present. Which sub-threshold values ALSO appear depends
    * on partition merge order — callers filter by the bound, not by
    * presence (StatsSpec pins exactly the guarantees, not the noise).
    *
    * treeAggregate keeps the driver out of the hot path: partition
    * summaries merge in a tree, each merge O(k log k), and only one
    * k-entry map ever reaches the driver. RDD-level on purpose — the
    * summary is genuinely per-partition imperative state with a custom
    * merge, the one case the DataFrame API can't express without a
    * full shuffle. */
  def heavyHitters(df: DataFrame, valCol: String, k: Int): Seq[(String, Long)] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vals = df.select(col(valCol).cast("string"))
      .filter(col(valCol).isNotNull)
      .rdd.map(_.getString(0))
    val merged = vals.treeAggregate(Map.empty[String, Long])(
      seqOp = (m, x) => mgAdd(m, x, k),
      combOp = (a, b) => mgMerge(a, b, k))
    merged.toSeq.sortBy { case (v, c) => (-c, v) }
  }

  /** MG insert: bump a tracked value, open a slot if one is free, else
    * decrement every counter (dropping zeros) — the classic step that
    * charges each untracked arrival against k tracked ones. */
  private def mgAdd(m: Map[String, Long], x: String, k: Int): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        m.flatMap { case (v, c) => if (c > 1) Some(v -> (c - 1)) else None }
    }

  /** MG merge: sum counts, then restore the k-entry bound by subtracting
    * the (k+1)-largest count from everything and dropping non-positives
    * — the mergeable-summaries rule that preserves the n/(k+1) error
    * bound across a treeAggregate of any shape. */
  private def mgMerge(a: Map[String, Long], b: Map[String, Long],
                      k: Int): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (v, c)) =>
      m.updated(v, m.getOrElse(v, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (v, c) =>
        if (c - cut > 0) Some(v -> (c - cut)) else None
      }
    }
  }

  /** Per-group deterministic k-sample by portable hash rank — bounded,
    * reproducible, engine-replayable ([[Similarity.knuthRank]], the one
    * shared definition — see its doc for the id-range contract: ids must
    * be non-negative and below ~3.4e9, or engines diverge on overflow
    * and negative-modulo semantics), applied per group: the "cap every
    * source at k docs" step of corpus mixing without a global sort. One
    * window shuffle on the group key. */
  def groupSample(df: DataFrame, groupCol: String, idCol: String,
                  k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(Similarity.knuthRank(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Temperature-weighted corpus mixing — the multilingual/multi-source
    * "α-sampling" step of a training-data pipeline: draw a fixed total
    * budget of documents with per-source take proportional to
    * n_s^τ (τ = 0.5 here, the classic sub-linear temperature that
    * up-weights small sources without letting one giant source dominate
    * the mixture).
    *
    * Engine-portable by construction, which is what makes it gate-able:
    *  - the weight is `floor(sqrt(n_s)·scale)` as a BIGINT — sqrt is
    *    IEEE-exact (correctly rounded in every implementation, unlike
    *    pow(x, τ)), the multiply is one correctly-rounded op, and floor
    *    is unambiguous, so both engines derive identical integer weights;
    *  - the denominator is an INTEGER sum (associative — no float
    *    accumulation-order hazard across engines or partitions);
    *  - the per-source take is `(budget·w_s) div Σw` in pure integer
    *    arithmetic, capped at n_s;
    *  - membership is the shared Knuth-rank order ([[Similarity
    *    .knuthRank]]), same contract as [[groupSample]].
    *
    * Scale shape: one partial-aggregated count per source (tiny), the
    * weight/denominator math on that tiny frame, then ONE window shuffle
    * on the source key for the rank filter — the broadcast of the
    * per-source targets is a handful of rows no matter the corpus size.
    * floor-rounding means the realized total can undershoot the budget
    * by at most one doc per source (never overshoots). */
  def temperatureMix(df: DataFrame, srcCol: String, idCol: String,
                     budget: Long, scale: Long = 10000L): DataFrame = {
    require(budget > 0 && scale > 0, s"need budget>0, scale>0; got $budget/$scale")
    // Whole-frame window (the counts frame is one row per SOURCE —
    // already tiny post-aggregation) rather than a 1-row cross join:
    // same integer denominator, and the plan stays join-free.
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__wi",
        floor(sqrt(col("__n").cast("double")) * scale).cast("long"))
    val targets = counts
      .withColumn("__denom", sum(col("__wi")).over(Window.partitionBy()))
      .withColumn("__tgt",
        least(col("__n"), expr(s"($budget * __wi) div __denom")))
      .select(col(srcCol), col("__tgt"))
    val w = Window.partitionBy(col(srcCol))
      .orderBy(Similarity.knuthRank(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(targets), srcCol)
      .filter(col("__rn") <= col("__tgt"))
      .drop("__rn", "__tgt")
  }

  /** Per-group z-score outlier flags WITHOUT a single float: a cell x
    * in group g is anomalous iff |x − μ| > z·σ, cross-multiplied into
    * pure BIGINT form — (n·x − s)²·zDen² > zNum²·(n·q − s²) with
    * s = Σx, q = Σx² (both sides are the n²-scaled inequality:
    * n²(x−μ)² = (n·x−s)² and n²σ² = n·q−s²) — so Spark, a
    * 1000-executor cluster and the
    * DuckDB oracle agree on every boundary cell (a float σ differs in
    * the last ulp across engines exactly when a cell sits ON the
    * threshold). Sample-less population σ; zero-variance groups flag
    * nothing (0 > 0 is false).
    *
    * Caller contract (documented, not checked row-wise): values are
    * integral and |n·max|x|| < 2^31 per group, so every product stays
    * inside int64 — true for count/duration/cents cells at any
    * realistic group width (n ≤ 10⁵, x ≤ 10⁴ → n·q ≤ 10¹⁴).
    *
    * Scale shape: ONE window over the group key computes (n, s, q) —
    * a single shuffle by group; the flag is a scan-stage expression.
    * Groups are assumed date/type-bounded (a 100 TB log has many
    * groups, not one); a global-group call degenerates to one
    * partition, as any global window does. */
  def zOutliers(cells: DataFrame, groupCol: String, xCol: String,
                zNum: Long, zDen: Long): DataFrame = {
    require(zNum > 0 && zDen > 0, s"need zNum, zDen > 0; got $zNum/$zDen")
    val w = Window.partitionBy(groupCol)
    val x = col(xCol).cast("long")
    val cent = col("__n") * x - col("__s")
    cells
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(x).over(w))
      .withColumn("__q", sum(x * x).over(w))
      .withColumn("is_anomaly",
        cent * cent * lit(zDen * zDen) >
          lit(zNum * zNum) *
            (col("__n") * col("__q") - col("__s") * col("__s")))
      .drop("__n", "__s", "__q")
  }

  /** 2-D Pareto skyline (MINIMIZE `xCol`, MAXIMIZE `yCol`, both integral
    * and non-negative): the points no other point dominates, where b
    * dominates a iff b.x ≤ a.x ∧ b.y ≥ a.y with one strict. The classic
    * O(n²) NOT-EXISTS formulation (the oracle's plan) dies at scale;
    * this plan is scan + tiny-broadcast + window over SURVIVORS:
    *
    *  1. Grid prefilter: bucket by ⌊x/bucketStep⌋, per-bucket max y
    *     (one partial-agg pass, ≤ xMax/bucketStep rows), running max
    *     over strictly-smaller buckets broadcast back; a point whose y
    *     is ≤ that max is dominated by something with strictly smaller
    *     x and dropped in the scan stage. Any dominator pruned here is
    *     itself dominated by a surviving point with smaller-still x
    *     (induction up the strictly-decreasing-x chain), so no skyline
    *     point is ever lost and every dominated survivor still has a
    *     surviving dominator.
    *  2. Exact pass over survivors: one global sort window — keep a
    *     point iff max(y) over x' < x is below its y (RANGE frame, so
    *     equal-x peers are excluded) and its y equals the max among
    *     its equal-x peers. Duplicates of a skyline (x, y) all
    *     survive, matching the strict-pair dominance definition.
    *
    * The global window is safe BECAUSE of step 1: survivors are one
    * candidate stripe per grid column, not the corpus (adversarial
    * worst case — the whole set on a Pareto staircase — makes the
    * OUTPUT that big, which no algorithm beats). */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                bucketStep: Long): DataFrame = {
    require(bucketStep >= 1, s"need bucketStep >= 1; got $bucketStep")
    val pts = df.withColumn("__x", col(xCol).cast("long"))
      .withColumn("__y", col(yCol).cast("long"))
      .withColumn("__b", expr(s"__x div $bucketStep"))
    val cum = pts.groupBy("__b").agg(max("__y").as("__bm"))
      .withColumn("__pm", max(col("__bm")).over(
        Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)))
      .select("__b", "__pm")
    val survivors = pts.join(broadcast(cum), "__b")
      .filter(col("__pm").isNull || col("__pm") < col("__y"))
    val prevMax = max(col("__y")).over(
      Window.orderBy("__x").rangeBetween(Window.unboundedPreceding, -1))
    val peerMax = max(col("__y")).over(
      Window.orderBy("__x").rangeBetween(Window.currentRow, Window.currentRow))
    survivors
      .withColumn("__prev", prevMax).withColumn("__peer", peerMax)
      .filter((col("__prev").isNull || col("__prev") < col("__y")) &&
        col("__y") === col("__peer"))
      .drop("__x", "__y", "__b", "__pm", "__prev", "__peer")
  }

  /** Exact second-moment sums per group over INTEGER-valued x/y
    * columns: (n, Σx, Σy, Σx², Σy², Σxy) — every cell a BIGINT, so
    * the one partial-aggregated shuffle is order-independent and any
    * engine reproduces it bit-for-bit. This is the distributed-stats
    * discipline: the built-in corr()/covar_pop() fold DOUBLES in
    * partition order, which differs run-to-run on a cluster — the
    * same class of nondeterminism the money sums avoid with
    * fixed-point cents. Callers derive correlation / OLS terms from
    * the moments (one double division at the very end, identical on
    * every engine because both operands are exact).
    *
    * Magnitude contract: |x|,|y| ≤ ~3·10⁶ with n ≤ ~10⁹ keeps Σxy
    * within signed-64; cents-scaled business values fit with room. */
  def momentSums(df: DataFrame, groupCol: String, x: Column,
                 y: Column): DataFrame =
    df.select(col(groupCol), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum("__x").as("sx"), sum("__y").as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"),
        sum(col("__x") * col("__y")).as("sxy"))

  /** Pearson correlation per group from [[momentSums]], rounded to 4
    * decimals: r = (n·Σxy − Σx·Σy) / √((n·Σx²−Σx²)·(n·Σy²−Σy²)).
    * Numerator and both variance terms are exact BIGINTs; only the
    * final sqrt/division floats, on identical operands everywhere.
    * Degenerate groups (zero variance on either axis) yield null. */
  def corrExact(df: DataFrame, groupCol: String, x: Column,
                y: Column): DataFrame = {
    val m = momentSums(df, groupCol, x, y)
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    m.withColumn("r",
      when(vx > 0 && vy > 0,
        round(cov.cast("double") /
          sqrt(vx.cast("double") * vy.cast("double")), 4)))
  }

  /** Per-group simple OLS fit y = a + b·x from [[momentSums]]:
    * slope b = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²), intercept
    * a = (Σy − b·Σx)/n, both rounded to 4. Exact-integer numerators
    * and denominators; zero-variance groups yield null slope. */
  def olsFit(df: DataFrame, groupCol: String, x: Column,
             y: Column): DataFrame = {
    val m = momentSums(df, groupCol, x, y)
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    m.withColumn("slope",
        when(den > 0, round(num.cast("double") / den.cast("double"), 4)))
      .withColumn("intercept",
        when(den > 0, round(
          (col("sy").cast("double") -
            (num.cast("double") / den.cast("double")) *
              col("sx").cast("double")) / col("n").cast("double"), 4)))
  }
}
