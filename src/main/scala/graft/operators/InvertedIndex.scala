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
              maxDf: Long, nBuckets: Int = 16): Unit = {
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
        // materialize BEFORE the overwrite below — the plan reads the
        // very bucket dirs the write replaces
        .localCheckpoint()
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket").parquet(dest)
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
