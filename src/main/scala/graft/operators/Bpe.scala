package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed BPE-style merge training over token sequences — the
  * vocabulary-learning step of a training-data pipeline (byte-pair
  * encoding when the input tokens are characters/subwords, phrase
  * mining when they are words; the operator is the same either way:
  * repeatedly merge the most frequent adjacent token pair).
  *
  * Representation: a document is ONE string `|t1||t2||t3|` — every
  * token wrapped in `|` bars, so an adjacent pair (a, b) is the exact
  * substring `|a||b|` and a merge is a plain (non-regex) string
  * replace, which both Spark and any oracle engine perform with the
  * same left-to-right non-overlapping greedy semantics (the BPE
  * convention: in `a a a` the pair (a,a) merges once, at the left).
  * Merged tokens join with a single space — impossible in a raw token
  * (tokens come from whitespace splitting), so merged tokens stay
  * atomic and unambiguous in later iterations. Contract: raw tokens
  * must not contain `|` (true of any whitespace tokenization of text
  * that was itself shingle/word material in this engine; [[wrap]] is
  * where a violating corpus would need escaping first).
  *
  * Scale shape: each iteration is ONE distributed pass — re-split the
  * wrapped string, count adjacent pairs with a map-side-combined
  * groupBy (bounded by the distinct-adjacent-pair vocabulary, not the
  * corpus), collect exactly ONE winner row to the driver, and apply
  * the merge as a scan-stage string replace. k merges = k such passes
  * over a persisted frame; nothing quadratic, no driver-side corpus.
  * For large k the per-merge pass dominates, which is what
  * [[trainMergesBatched]] amortizes: apply the top-m TOKEN-DISJOINT
  * pairs of one count in one pass (the standard parallel-BPE batching;
  * disjointness makes the batch order-independent, and BpeSpec pins
  * batched == sequential on a disjoint-frequency corpus).
  */
object Bpe {
  final case class Merge(step: Int, a: String, b: String, cnt: Long)

  /** `|t1||t2||t3|` render of a token array; empty array → "". */
  def wrap(tokens: Column): Column =
    when(size(tokens) > 0,
      concat(lit("|"), concat_ws("||", tokens), lit("|")))
      .otherwise(lit(""))

  /** Inverse of [[wrap]] (post-merge tokens may contain spaces). */
  def unwrap(s: Column): Column =
    when(length(s) > lit(2),
      split(s.substr(lit(2), length(s) - 2), "\\|\\|"))
      .otherwise(array().cast("array<string>"))

  /** Adjacent-pair counts over a wrapped-string column: (a, b, cnt). */
  def pairCounts(df: DataFrame, sCol: String): DataFrame = {
    val toks = unwrap(col(sCol))
    df.select(toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("a"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("b"))).as("__p"))
      .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** One merge as a plain string replace on the wrapped form. */
  def applyMerge(s: Column, a: String, b: String): Column =
    call_function("replace", s, lit(s"|$a||$b|"), lit(s"|$a $b|"))

  /** Fold a learned merge list over a wrapped-string column, in order.
    * Expression depth grows with the merge count — right for the gate's
    * 8 merges, wrong for a real 32k-merge vocabulary; deploy
    * [[applyMergesFast]] there. */
  def applyMerges(s: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.step).foldLeft(s)((c, m) => applyMerge(c, m.a, m.b))

  /** Deployable tokenizer apply: one pass per row with a rank heap —
    * O(n log n) per document and O(1) corpus passes regardless of the
    * merge count, vs [[applyMerges]]' merge-count-deep expression chain.
    *
    * Equivalent to the in-order fold by construction: a merge learned at
    * step i can only reference tokens that existed BEFORE step i, and
    * fusing two tokens never creates a new adjacency of two pre-existing
    * tokens — so every candidate pair created during merging involves
    * the just-fused token and therefore carries a LATER rank than the
    * merge that created it. Processing candidates in (rank, position)
    * order is then exactly the fold's order (BpeSpec pins the
    * equivalence on learned merges and on the overlapping-run edge
    * cases). The rank map rides the closure once per task — a 32k-merge
    * vocabulary is ~1 MB, broadcast-sized. */
  def tokenMerger(merges: Seq[Merge]): Seq[String] => Seq[String] = {
    val rank: Map[(String, String), Int] = merges.sortBy(_.step)
      .zipWithIndex.map { case (m, i) => (m.a, m.b) -> i }.toMap
    (toks: Seq[String]) => mergeOne(toks, rank)
  }

  /** Column form of [[tokenMerger]] over a token-array column. */
  def applyMergesFast(tokens: Column, merges: Seq[Merge]): Column =
    udf(tokenMerger(merges)).apply(tokens)

  private def mergeOne(toks: Seq[String],
                       rank: Map[(String, String), Int]): Seq[String] = {
    val n = toks.length
    if (n < 2 || rank.isEmpty) return toks
    val tok = toks.toArray
    val prev = Array.tabulate(n)(_ - 1)
    val next = Array.tabulate(n)(i => if (i == n - 1) -1 else i + 1)
    val alive = Array.fill(n)(true)
    // (rank, pos, left, right); left/right snapshot detects stale entries
    val pq = collection.mutable.PriorityQueue.empty[(Int, Int, String, String)](
      Ordering.by { case (r, p, _, _) => (-r, -p) })
    def offer(i: Int): Unit = {
      val j = next(i)
      if (j != -1) rank.get((tok(i), tok(j)))
        .foreach(r => pq.enqueue((r, i, tok(i), tok(j))))
    }
    (0 until n - 1).foreach(offer)
    while (pq.nonEmpty) {
      val (_, i, a, b) = pq.dequeue()
      val j = if (alive(i)) next(i) else -1
      if (j != -1 && alive(j) && tok(i) == a && tok(j) == b) {
        tok(i) = a + " " + b
        alive(j) = false
        next(i) = next(j)
        if (next(j) != -1) prev(next(j)) = i
        if (prev(i) != -1 && alive(prev(i))) offer(prev(i))
        offer(i)
      }
    }
    val out = Seq.newBuilder[String]
    var i = 0
    while (i != -1 && i < n) { if (alive(i)) out += tok(i); i = next(i) }
    out.result()
  }

  /** Sequential BPE training: `nMerges` iterations, each merging the
    * single most frequent adjacent pair (ties broken by (a, b) order —
    * fully deterministic, engine-replayable). Stops early when no pair
    * is left. `docs` must already carry the wrapped form in `sCol`. */
  def trainMerges(docs: DataFrame, sCol: String, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var cur = docs.select(col(sCol).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // r17: a round is ONE job again — the next round's pair count both
    // materializes `next` (from the still-cached parent) and caches it,
    // so the explicit `next.count()` job per merge was pure overhead;
    // the parent is released one round LATE (after the pass that cached
    // its child) instead of eagerly, holding at most two generations.
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = pairCounts(cur, "s")
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      prev.foreach(_.unpersist()) // cur is cached now; drop its parent
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, a, b, c)
        val next = cur.select(applyMerge(col("s"), a, b).as("s"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = Some(cur)
        cur = next
        step += 1
      }
    }
    prev.foreach(_.unpersist())
    cur.unpersist()
    merges.result()
  }

  /** Batched BPE training — the deployable shape for large vocabularies:
    * per round, ONE pair count selects up to `batch` merges greedily in
    * (cnt desc, a, b) order, skipping any pair sharing a token with an
    * already-selected pair (disjointness makes the batch equivalent to
    * applying its members sequentially in any order), then applies them
    * all in a single pass. Counts recorded are from the round's shared
    * count — for token-disjoint winners these equal the sequential
    * algorithm's counts; where frequencies interact, batched is the
    * documented approximation (same gate-config/deploy-config split as
    * simhash32/64). ~k/batch passes instead of k. */
  def trainMergesBatched(docs: DataFrame, sCol: String, nMerges: Int,
                         batch: Int = 8): Seq[Merge] = {
    require(nMerges >= 1 && batch >= 1,
      s"need nMerges>=1, batch>=1; got $nMerges/$batch")
    var cur = docs.select(col(sCol).as("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // r17: same lazy-unpersist round shape as [[trainMerges]] — one job
    // per round, parent released after the pass that cached its child.
    var prev: Option[DataFrame] = None
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val want = math.min(batch, nMerges - step + 1)
      // 4x over-fetch: greedy disjoint filtering drops conflicting pairs
      val top = pairCounts(cur, "s")
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(want * 4).collect()
      prev.foreach(_.unpersist())
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        var used = Set.empty[String]
        val picked = top.iterator
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .filter { case (a, b, _) =>
            val ok = !used(a) && !used(b)
            if (ok) used ++= Seq(a, b)
            ok
          }
          .take(want).toSeq
        val folded = picked.foldLeft(col("s")) {
          case (c, (a, b, _)) => applyMerge(c, a, b)
        }
        picked.foreach { case (a, b, c) =>
          merges += Merge(step, a, b, c); step += 1
        }
        val next = cur.select(folded.as("s"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = Some(cur)
        cur = next
      }
    }
    prev.foreach(_.unpersist())
    cur.unpersist()
    merges.result()
  }
}
