package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token → posting-list inverted index over a document corpus, plus the
  * conjunctive (AND-of-terms) search that consumes it — the retrieval
  * primitive behind decontamination-by-lookup, targeted corpus audits
  * ("every doc mentioning X and Y"), and eval-set leak triage, where
  * re-scanning 100 TB of text per question is not an option.
  *
  * Scale shape of [[build]]:
  *
  *  - document frequencies come from one partial-aggregated groupBy over
  *    (doc, token) pairs — map-side combine does the heavy lifting, the
  *    shuffled volume is the vocabulary, not the token stream;
  *  - posting lists are materialized ONLY for tokens at or under the
  *    df cap. A stop-word's posting list at corpus scale is "most of the
  *    corpus" — a multi-GB single row that a collect_list would have to
  *    assemble BEFORE any cap could drop it. So hot tokens are removed
  *    from the pair stream first (tiny broadcast anti-join, the same
  *    df-cap pattern as [[Dedup.capDocFreq]]) and keep a NULL posting
  *    list beside their exact df: the index still answers "how common is
  *    this term" for every token while bounding every materialized row.
  *
  * [[searchAll]] never touches the corpus: it explodes the posting lists
  * of just the queried terms (a handful of index rows) and intersects by
  * counting — candidate volume is the sum of the queried lists, which
  * the df cap already bounded. Hot (NULL-postings) terms are dropped
  * from the conjunction as non-selective, the standard IR treatment of
  * stop-words in AND queries: they barely filter, and resolving them
  * would mean a corpus scan. At least one cold term is required.
  *
  * Reference semantics: the barcode/property search services
  * (`search-service` analogs, SURVEY.md §2.1 S14) answer point
  * predicates over registered metadata; this generalizes the shape to
  * full-text membership at training-corpus scale.
  */
object InvertedIndex {

  /** (tok, df, postings) — `df` is the exact distinct-document count for
    * every token; `postings` is the sorted doc-id array for tokens with
    * df ≤ maxDf and NULL for hotter ones (see class doc). `tokCol` must
    * evaluate to array<string>; ids are collected as-is (caller's type).
    */
  def build(docs: DataFrame, idCol: String, tokCol: Column,
            maxDf: Long): DataFrame = {
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    val pairs = docs
      .select(col(idCol).as("id"), explode(array_distinct(tokCol)).as("tok"))
    val dfs = pairs.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val hot = dfs.filter(col("df") > maxDf).select("tok")
    val postings = pairs
      .join(broadcast(hot), Seq("tok"), "left_anti")
      .groupBy(col("tok"))
      .agg(sort_array(collect_list(col("id"))).as("postings"))
    dfs.join(postings, Seq("tok"), "left")
  }

  /** [[build]] variant carrying the per-document statistics ranked
    * retrieval needs: postings become array<struct<id, tf, dl>> — term
    * frequency and document length ride WITH each posting, so scoring a
    * query later never joins back to the corpus (the denormalization is
    * paid once at build, amortized over every query). Same df-cap/NULL
    * treatment of hot tokens as [[build]]. `idCol` must be numeric
    * (posting structs sort by id). */
  def buildScored(docs: DataFrame, idCol: String, tokCol: Column,
                  maxDf: Long): DataFrame = {
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    val raw = docs.select(col(idCol).cast("long").as("id"),
      explode(tokCol).as("tok"))
    val tfs = raw.groupBy(col("tok"), col("id"))
      .agg(count(lit(1)).as("tf"))
    val lens = raw.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val dfs = tfs.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val hot = dfs.filter(col("df") > maxDf).select("tok")
    val postings = tfs
      .join(broadcast(hot), Seq("tok"), "left_anti")
      .join(lens, Seq("id"))
      .groupBy(col("tok"))
      .agg(sort_array(collect_list(struct(col("id"), col("tf"), col("dl"))))
        .as("postings"))
    dfs.join(postings, Seq("tok"), "left")
  }

  /** BM25-family ranked (disjunctive OR) retrieval over [[buildScored]]'s
    * output: top `topN` documents by summed per-term score, resolved
    * purely from posting lists — candidate volume is the union of the
    * queried terms' lists, bounded by the build's df cap. Hot (NULL-
    * postings) terms are dropped as non-selective, exactly as in
    * [[searchAll]]; at least one queried term must be cold.
    *
    * The default scoring is the RATIONAL BM25 surrogate (k1 = 1.2,
    * b = 0.75 folded into exact integer arithmetic): per-term
    * contribution
    *
    *   round(1e6 · (2N−2df+1)·22·L·tf / ((2df+1)·(10·L·tf + 3·L + 9·dl·N)))
    *
    * — BM25's tf saturation and length normalization with the idf's ln
    * replaced by its (monotone) argument, every intermediate an exact
    * BIGINT, ONE double division per (term, doc), and the per-document
    * sum an order-independent BIGINT. That makes the ranking replayable
    * bit-for-bit on any ANSI engine (gate row q_bm25); `ln = true`
    * switches to the standard Robertson idf ln((N−df+0.5)/(df+0.5)) in
    * doubles — same candidate shape, the form a deployment would likely
    * prefer when cross-engine hash parity is not a requirement. The
    * integer products stay double-exact (< 2^53) for corpora up to
    * ~10^8 tokens with the gate's tf/df ranges; beyond that the ln form
    * avoids the question entirely.
    *
    * @param n corpus document count  @param lTotal corpus token count
    *   (both resolved by the caller from one bounded aggregate — the
    *   data-dependent-config pattern) */
  def bm25TopN(index: DataFrame, terms: Seq[String], n: Long, lTotal: Long,
               topN: Int, ln: Boolean = false): DataFrame = {
    val distinct = terms.distinct
    require(distinct.nonEmpty, "need at least one term")
    require(n > 0 && lTotal > 0, s"corpus stats must be positive: n=$n L=$lTotal")
    val hits = index.filter(col("tok").isin(distinct: _*))
    // Bounded driver read: ≤ |terms| rows (same contract as searchAll).
    val resolved = hits.select(col("tok"), col("postings").isNull.as("hot"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val cold = distinct.filter(t => !resolved.getOrElse(t, true))
    require(cold.nonEmpty,
      s"no cold queried term resolves in the index: $distinct — nothing " +
        "bounded to score (hot terms are non-selective, absent ones empty)")
    val cand = hits.filter(col("tok").isin(cold: _*))
      .select(col("df"), explode(col("postings")).as("p"))
      .select(col("df"), col("p.id").as("id"), col("p.tf").as("tf"),
        col("p.dl").as("dl"))
    val contrib = if (ln) {
      val idf = log((lit(n).cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
      val tfn = (col("tf") * lit(2.2)).cast("double") /
        (col("tf") + lit(0.3) + (lit(0.9) * col("dl") * n / lTotal))
      idf * tfn
    } else {
      val a = (lit(2 * n) - col("df") * 2 + 1) * lit(22L) * lit(lTotal) * col("tf")
      val b = (col("df") * 2 + 1) *
        (lit(10L) * lTotal * col("tf") + lit(3L) * lTotal + lit(9L) * col("dl") * n)
      round(lit(1e6) * (a.cast("double") / b.cast("double")), 0).cast("long")
    }
    cand.withColumn("c", contrib)
      .groupBy(col("id"))
      .agg(sum(col("c")).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topN)
  }

  /** Publish an index to disk, hash-partitioned on `tok` into
    * `__bucket=` dirs — the layout [[refresh]] and [[lookupTerms]]
    * consume: a delta refresh rewrites only the buckets its tokens hash
    * into, and a term lookup reads only the queried terms' buckets
    * (directory-level pruning, never a full index scan). Same
    * published-layout pattern as [[Similarity.ivfPublish]]. */
  def publish(index: DataFrame, dest: String, nBuckets: Int = 16): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    index.withColumn("__bucket", pmod(hash(col("tok")), lit(nBuckets)))
      .write.mode("overwrite").partitionBy("__bucket").parquet(dest)
  }

  /** Merge a batch of NEW documents into a published index without
    * rescanning the indexed corpus: the delta index is built from
    * `newDocs` alone, only the buckets its tokens hash into are read
    * back (partition-pruned) and rewritten (dynamic partition
    * overwrite) — at corpus scale the refresh cost is the DELTA's
    * token stream plus the touched buckets, not the index.
    *
    * Contract: `newDocs` ids are disjoint from the indexed ones (an
    * append-only corpus — re-registering a doc would double-count its
    * df), and `maxDf` equals the publish-time cap. df only grows, so
    * cold→hot transitions drop posting lists consistently; the reverse
    * (a RAISED cap turning a hot token cold) cannot be answered from
    * the index — the hot token's postings were never materialized —
    * and needs the rebuild path. A crash mid-write can leave partially
    * rewritten buckets; a streaming deployment wraps this merge in
    * [[graft.streaming.Ingest]]'s staged-swap commit (recoverSwap),
    * which is exactly-once per micro-batch. */
  def refresh(spark: org.apache.spark.sql.SparkSession, dest: String,
              newDocs: DataFrame, idCol: String, tokCol: Column,
              maxDf: Long, nBuckets: Int = 16): Unit =
    withMergedDelta(spark, dest, newDocs, idCol, tokCol, maxDf, nBuckets) {
      merged =>
        // materialize BEFORE the overwrite below — the plan reads the
        // very bucket dirs the write replaces
        merged.localCheckpoint().write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__bucket").parquet(dest)
    }

  /** [[refresh]]'s crash-safe twin: the merged touched buckets land in
    * `stagingDir` instead of overwriting `dest` in place — the caller
    * owns the swap (graft.streaming.Ingest.applyIndexBatch's staged
    * commit). Writing elsewhere also removes refresh's localCheckpoint:
    * the plan no longer reads the dirs it replaces, so the merge is one
    * job with no intermediate materialization. */
  def refreshStaged(spark: org.apache.spark.sql.SparkSession, dest: String,
                    stagingDir: String, newDocs: DataFrame, idCol: String,
                    tokCol: Column, maxDf: Long, nBuckets: Int = 16): Unit =
    withMergedDelta(spark, dest, newDocs, idCol, tokCol, maxDf, nBuckets) {
      merged =>
        merged.write.mode("overwrite")
          .partitionBy("__bucket").parquet(stagingDir)
    }

  private def withMergedDelta(spark: org.apache.spark.sql.SparkSession,
                              dest: String, newDocs: DataFrame, idCol: String,
                              tokCol: Column, maxDf: Long, nBuckets: Int)
                             (write: DataFrame => Unit): Unit = {
    val delta = build(newDocs, idCol, tokCol, maxDf)
      .withColumn("__bucket", pmod(hash(col("tok")), lit(nBuckets)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ≤ nBuckets rows — a bounded driver collect, not O(delta).
      val touched = delta.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSeq
      val existing = spark.read.parquet(dest)
        .filter(col("__bucket").isin(touched: _*))
      val dfSum = coalesce(col("o.df"), lit(0L)) + coalesce(col("d.df"), lit(0L))
      // When dfSum ≤ maxDf, BOTH sides are cold (df is monotone), so a
      // NULL side here means "token absent from that side", never "hot".
      val posts = when(dfSum > maxDf, lit(null))
        .when(col("o.postings").isNull, col("d.postings"))
        .when(col("d.postings").isNull, col("o.postings"))
        .otherwise(sort_array(concat(col("o.postings"), col("d.postings"))))
      val merged = existing.as("o")
        .join(delta.as("d"), Seq("tok", "__bucket"), "full_outer")
        .select(col("tok"), dfSum.as("df"), posts.as("postings"),
          col("__bucket"))
      write(merged)
    } finally { delta.unpersist(); () }
  }

  /** Point-read index rows for `terms` from a published index: the
    * terms' bucket ids resolve through the SAME hash expression the
    * layout was written with (bounded |terms|-row job), and the literal
    * `isin` lands in the scan's PartitionFilters — only the queried
    * buckets' directories are listed or read. Feed the result straight
    * to [[searchAll]]. */
  def lookupTerms(spark: org.apache.spark.sql.SparkSession, dest: String,
                  terms: Seq[String], nBuckets: Int = 16): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val buckets = spark.createDataFrame(terms.distinct.map(Tuple1.apply))
      .toDF("tok")
      .select(pmod(hash(col("tok")), lit(nBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    spark.read.parquet(dest)
      .filter(col("__bucket").isin(buckets: _*) && col("tok").isin(terms: _*))
      .drop("__bucket")
  }

  /** Doc ids whose documents contain ALL the given terms (conjunctive
    * query over [[build]]'s output). Terms missing from the index make
    * the result empty (they appear in no document); hot terms are
    * dropped as non-selective — at least one queried term must be cold,
    * or there is nothing bounded to intersect. */
  def searchAll(index: DataFrame, terms: Seq[String]): DataFrame = {
    val distinct = terms.distinct
    require(distinct.nonEmpty, "need at least one term")
    val hits = index
      .filter(col("tok").isin(distinct: _*))
      .select(col("tok"), col("postings"))
    // Bounded driver read: ≤ |terms| rows, one per queried index entry.
    val resolved = hits.select(col("tok"), col("postings").isNull.as("hot"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val cold = distinct.filter(t => !resolved.getOrElse(t, true))
    if (distinct.exists(t => !resolved.contains(t))) {
      // A term in NO document: conjunction is empty, skip the explode.
      val elemT = index.schema("postings").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      return index.limit(0).select(lit(null).cast(elemT).as("id"))
    }
    require(cold.nonEmpty,
      s"all queried terms are hot (df over the index cap): $distinct — " +
        "an unbounded conjunction; add a selective term")
    hits.filter(col("tok").isin(cold: _*))
      .select(col("tok"), explode(col("postings")).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === cold.size)
      .select("id")
  }
}
