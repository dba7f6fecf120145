package graft.operators

import graft.functions.TextFunctions.shaHash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-free text featurization: the feature-hashing trick (Weinberger
  * et al., ICML'09) — every token is hashed to one of `dim` buckets with
  * a ±1 sign from a second independent hash, and a document's vector is
  * the signed token-count sum per bucket. Unbiased inner-product
  * preservation comes from the sign hash; no vocabulary, no training, no
  * model artifact to ship — which is what makes it the bootstrap
  * embedding for ANN / near-dup / clustering over a corpus that has no
  * model-generated embeddings yet (every Similarity/Clustering operator
  * downstream accepts these vectors after a cast to float).
  *
  * Scale shape: one explode over tokens, ONE partial-aggregated groupBy
  * on (id, bucket) — map-side combine caps each partition's shuffle
  * contribution at dim rows per doc — then a groupBy(id) that assembles
  * the dense vector (at most dim entries per doc). Everything before
  * the first shuffle is scan-stage codegen; vectors are integers, so
  * there is no float accumulation-order hazard anywhere.
  *
  * Hashes are sha256-derived ([[graft.functions.TextFunctions
  * .shaHash32]]) with distinct "e:"/"s:" key prefixes for bucket and
  * sign, so any engine replays the exact vectors — the same
  * cross-engine-portability contract as [[Sketches]].
  */
object Featurize {
  /** Bucket of `tok` in a `dim`-wide hashed feature space. */
  def hashDim(tok: Column, dim: Int): Column =
    shaHash32(concat(lit("e:"), tok)) % dim

  /** ±1 sign of `tok` (independent hash — "s:" prefix). */
  def hashSign(tok: Column): Column =
    when(shaHash32(concat(lit("s:"), tok)) % 2 === 0, lit(1L)).otherwise(lit(-1L))

  /** (id, vec: array<bigint> of length `dim`, sqnorm): signed hashed
    * token counts, multiplicity included. Every input row keeps a row —
    * a doc with no tokens embeds as the zero vector (the left join back
    * to the id spine), so downstream joins never silently drop docs. */
  def hashEmbed(docs: DataFrame, idCol: String, tokCol: Column,
                dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val comps = docs
      .select(col(idCol).as("id"), explode(tokCol).as("tok"))
      .select(col("id"), hashDim(col("tok"), dim).as("d"),
        hashSign(col("tok")).as("sgn"))
      .groupBy("id", "d").agg(sum("sgn").as("v"))
    val vecs = comps.groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("d"), col("v")))).as("m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))).as("vec"))
    docs.select(col(idCol).as("id")).join(vecs, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("vec"), array_repeat(lit(0L), dim)).as("vec"))
      .withColumn("sqnorm",
        aggregate(col("vec"), lit(0L), (a, x) => a + x * x))
  }

  /** The hashed vector as array<float> — the shape every ANN /
    * clustering operator in [[Similarity]]/[[Clustering]] consumes. */
  def asFloatVec(vec: Column): Column = transform(vec, _.cast("float"))

  /** Windowed co-occurrence pairs with a PMI-ordered score — the corpus
    * statistic behind count-based embeddings and collocation mining
    * (Church & Hanks 1990). Pairs are generated IN-ROW (each position
    * against its next `window` neighbors via `slice` — no self-join of
    * the token stream, no shuffle until the pair count), normalized to
    * (least, greatest). The score is the RATIONAL PMI core
    * `c_ab·N·10⁴ div (c_a·c_b)` — exact BIGINT, same ORDER as real PMI
    * (log is monotone), so the gate carries no float and any engine
    * replays it; a deployment wanting nats applies log to the same
    * ratio. Scale shape: one explode + three partial-aggregated
    * groupBys; the unigram table joins back keyed on each pair side.
    * Magnitude guard: c_ab·N·10⁴ stays in int64 while c_ab·N < 9·10¹⁴
    * — corpora beyond that shard the count tables first (documented,
    * not silently truncated). */
  /** Deterministic contrastive negatives: for each anchor, `k`
    * negatives drawn by sha-derived probes into the DENSE id space
    * [0, n), skipping probes that hit the anchor itself or share its
    * exclusion key (the in-batch-duplicate hazard of real contrastive
    * training). The hash-rank analog of "sample k random negatives":
    * stable across runs and cluster sizes, and LINEAR — anchors ×
    * `attempts` probe rows through ONE equi-join on the probed id,
    * never a candidate cross join. Probes keep their attempt order, so
    * "first k valid" is well-defined; an anchor yields fewer than k
    * rows only if > attempts−k probes were invalid (tune attempts ≫ k;
    * deterministic either way). Requires ids dense in [0, n) — the
    * [[graft.operators.Shards]] layout provides exactly that. */
  def negativeSamples(emb: DataFrame, idCol: String, exclCol: String,
                      anchors: DataFrame, n: Long, k: Int,
                      attempts: Int): DataFrame = {
    require(n >= 1 && k >= 1 && attempts >= k,
      s"need n>=1, 1<=k<=attempts; got n=$n k=$k attempts=$attempts")
    val probes = anchors
      .select(col(idCol).as("anchor"), col(exclCol).as("__aexcl"))
      .withColumn("j", explode(sequence(lit(0), lit(attempts - 1))))
      .withColumn("cand_id", graft.functions.TextFunctions.shaHash32(
        concat(lit("neg:"), col("anchor"), lit(":"), col("j"))) % n)
    val cands = emb.select(col(idCol).as("cand_id"),
      col(exclCol).as("__cexcl"))
    val valid = probes.join(cands, "cand_id")
      .filter(col("cand_id") =!= col("anchor") &&
        col("__cexcl") =!= col("__aexcl"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("anchor").orderBy("j")))
      .filter(col("rk") <= k)
    valid.select(col("anchor"), col("rk"), col("j"), col("cand_id"),
      col("__cexcl").as("cand_" + exclCol))
  }

  def pmiPairs(docs: DataFrame, tokCol: Column, window: Int,
               minCount: Long, totalTokens: Long): DataFrame = {
    require(window >= 1, s"need window >= 1; got $window")
    require(totalTokens >= 1, s"need totalTokens >= 1; got $totalTokens")
    val tk = docs.select(tokCol.as("tk"))
    val pairs = tk.select(explode(flatten(transform(
        sequence(lit(1), size(col("tk"))),
        i => transform(slice(col("tk"), i + 1, lit(window)), t =>
          struct(least(element_at(col("tk"), i), t).as("a"),
            greatest(element_at(col("tk"), i), t).as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val uni = tk.select(explode(col("tk")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    // totalTokens rides as a LITERAL (callers get it from one bounded
    // 1-row driver agg, the q_bm25 pattern) — a 1-row N frame would be
    // a cross join for nothing
    pairs.filter(col("c_ab") >= minCount)
      .join(uni.select(col("tok").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("tok").as("b"), col("c").as("c_b")), "b")
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        // integral div (Spark `div` / oracle `//` agree on positives);
        // Column./ would be double division
        expr(s"c_ab * $totalTokens * 10000 DIV (c_a * c_b)").as("pmi4"))
  }
}
