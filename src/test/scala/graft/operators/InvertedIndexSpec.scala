package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  // 6 docs; "the" is in all of them (hot at maxDf=4), "rare" in two,
  // "once" in one, and repeats within a doc must not inflate df
  private def docs = Seq(
    (1L, "the rare cat"),
    (2L, "the the dog"),
    (3L, "the bird rare"),
    (4L, "the fish"),
    (5L, "the once fish"),
    (6L, "the dog")).toDF("doc_id", "text")

  private def toks = filter(split(trim(col("text")), "\\s+"), t => length(t) > 0)

  private def idx = InvertedIndex.build(docs, "doc_id", toks, maxDf = 4L)

  test("df is exact per-document frequency; postings sorted; hot tokens NULL") {
    val r = idx.orderBy("tok")
      .as[(String, Long, Option[Seq[Long]])].collect().toSeq
    assert(r === Seq(
      ("bird", 1L, Some(Seq(3L))),
      ("cat", 1L, Some(Seq(1L))),
      ("dog", 2L, Some(Seq(2L, 6L))),
      ("fish", 2L, Some(Seq(4L, 5L))),
      ("once", 1L, Some(Seq(5L))),
      ("rare", 2L, Some(Seq(1L, 3L))),
      ("the", 6L, None))) // hot: exact df kept, postings not materialized
  }

  test("searchAll intersects posting lists (AND semantics)") {
    val hits = InvertedIndex.searchAll(idx, Seq("rare", "cat"))
      .as[Long].collect().toSeq.sorted
    assert(hits === Seq(1L))
    val dogFish = InvertedIndex.searchAll(idx, Seq("dog", "fish"))
      .as[Long].collect().toSeq
    assert(dogFish.isEmpty) // both exist, no doc has both
  }

  test("a term absent from the corpus empties the conjunction") {
    val hits = InvertedIndex.searchAll(idx, Seq("rare", "unicorn"))
    assert(hits.count() === 0)
    assert(hits.columns.toSeq === Seq("id"))
  }

  test("hot terms are dropped as non-selective; all-hot queries refuse") {
    // "the" is hot: conjunction must equal the cold-only query
    val withHot = InvertedIndex.searchAll(idx, Seq("the", "fish"))
      .as[Long].collect().toSeq.sorted
    assert(withHot === Seq(4L, 5L))
    val ex = intercept[IllegalArgumentException] {
      InvertedIndex.searchAll(idx, Seq("the"))
    }
    assert(ex.getMessage.contains("hot"))
  }

  test("publish + refresh == full rebuild (including cold→hot transitions)") {
    val dest = java.nio.file.Files.createTempDirectory("graft_idx").toString + "/idx"
    val old = docs.filter(col("doc_id") <= 3)
    val fresh = docs.filter(col("doc_id") > 3)
    // maxDf=4: "the" is cold at publish time (df 3) and crosses to hot
    // after the refresh (df 6 > 4) — its postings must be DROPPED
    InvertedIndex.publish(InvertedIndex.build(old, "doc_id", toks, 4L), dest)
    InvertedIndex.refresh(spark, dest, fresh, "doc_id", toks, 4L)
    val got = spark.read.parquet(dest).drop("__bucket").orderBy("tok")
      .as[(String, Long, Option[Seq[Long]])].collect().toSeq
    val want = idx.orderBy("tok")
      .as[(String, Long, Option[Seq[Long]])].collect().toSeq
    assert(got === want)
  }

  test("refresh rewrites ONLY the buckets the delta's tokens hash into") {
    val dest = java.nio.file.Files.createTempDirectory("graft_idx").toString + "/idx"
    InvertedIndex.publish(InvertedIndex.build(docs, "doc_id", toks, 4L), dest)
    val before = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("__bucket="))
      .map(d => d.getName ->
        d.listFiles().map(f => (f.getName, f.length, f.lastModified)).toSet)
      .toMap
    // delta introduces one brand-new token: exactly its bucket changes
    val delta = Seq((100L, "newtoken")).toDF("doc_id", "text")
    InvertedIndex.refresh(spark, dest, delta, "doc_id", toks, 4L)
    val touched = spark.range(1).select(
      pmod(hash(lit("newtoken")), lit(16)).as("b")).head().getInt(0)
    val after = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("__bucket="))
      .map(d => d.getName ->
        d.listFiles().map(f => (f.getName, f.length, f.lastModified)).toSet)
      .toMap
    for ((name, files) <- before if name != s"__bucket=$touched")
      assert(after(name) === files, s"untouched $name was rewritten")
    assert(after(s"__bucket=$touched") !== before.get(s"__bucket=$touched"))
    // and the new token is queryable
    val row = spark.read.parquet(dest).filter(col("tok") === "newtoken")
      .select("df").as[Long].collect().toSeq
    assert(row === Seq(1L))
  }

  test("lookupTerms prunes to the queried terms' bucket partitions") {
    val dest = java.nio.file.Files.createTempDirectory("graft_idx").toString + "/idx"
    InvertedIndex.publish(InvertedIndex.build(docs, "doc_id", toks, 4L), dest)
    val looked = InvertedIndex.lookupTerms(spark, dest, Seq("rare", "cat"))
    val plan = looked.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("__bucket"),
      s"bucket literals must reach PartitionFilters, got '$pf':\n$plan")
    // and the pruned subset answers the conjunction like the full index
    val hits = InvertedIndex.searchAll(looked, Seq("rare", "cat"))
      .as[Long].collect().toSeq
    assert(hits === Seq(1L))
  }

  test("buildScored carries (id, tf, dl) per posting; hot stays NULL") {
    val r = InvertedIndex.buildScored(docs, "doc_id", toks, maxDf = 4L)
      .orderBy("tok")
      .as[(String, Long, Option[Seq[(Long, Long, Long)]])].collect().toSeq
    assert(r.find(_._1 == "dog").get ===
      (("dog", 2L, Some(Seq((2L, 1L, 3L), (6L, 1L, 2L))))))
    assert(r.find(_._1 == "the").get === (("the", 6L, None)))
    // repeats inside a doc land in tf, not df: "the" would have tf=2 in
    // doc 2 — verify via a corpus where it stays cold
    val cold = InvertedIndex.buildScored(docs, "doc_id", toks, maxDf = 10L)
      .filter(col("tok") === "the")
      .as[(String, Long, Option[Seq[(Long, Long, Long)]])].head()
    assert(cold._3.get.find(_._1 == 2L).get === ((2L, 2L, 3L)))
  }

  // Corpus stats for the 6-doc fixture: N=6 docs, L=16 tokens.
  private def scoredIdx = InvertedIndex.buildScored(docs, "doc_id", toks, 4L)

  test("bm25TopN ranks by the rational surrogate — hand-computed scores") {
    // terms dog/fish: each df=2, tf=1 everywhere. A=(12-4+1)*22*16=3168;
    // B=5*(160+48+54*dl): dl=2 → 1580 (score 2005063), dl=3 → 1850
    // (score 1712432). Shorter docs rank first, ties break by id.
    val r = InvertedIndex.bm25TopN(scoredIdx, Seq("dog", "fish"),
      n = 6L, lTotal = 16L, topN = 10)
      .as[(Long, Long)].collect().toSeq
    assert(r === Seq((4L, 2005063L), (6L, 2005063L),
      (2L, 1712432L), (5L, 1712432L)))
  }

  test("bm25TopN drops hot terms; all-hot queries refuse") {
    val withHot = InvertedIndex.bm25TopN(scoredIdx, Seq("the", "fish"),
      n = 6L, lTotal = 16L, topN = 10).as[(Long, Long)].collect().toSeq
    val coldOnly = InvertedIndex.bm25TopN(scoredIdx, Seq("fish"),
      n = 6L, lTotal = 16L, topN = 10).as[(Long, Long)].collect().toSeq
    assert(withHot === coldOnly)
    val ex = intercept[IllegalArgumentException] {
      InvertedIndex.bm25TopN(scoredIdx, Seq("the"), 6L, 16L, 10)
    }
    assert(ex.getMessage.contains("cold"))
  }

  test("ln twin produces the same ranking as the rational gate form here") {
    val gate = InvertedIndex.bm25TopN(scoredIdx, Seq("dog", "fish", "rare"),
      n = 6L, lTotal = 16L, topN = 10).select("id").as[Long].collect().toSeq
    val lnR = InvertedIndex.bm25TopN(scoredIdx, Seq("dog", "fish", "rare"),
      n = 6L, lTotal = 16L, topN = 10, ln = true)
      .select("id").as[Long].collect().toSeq
    assert(gate === lnR)
  }

  test("topN truncates after the (score, id) order") {
    val r = InvertedIndex.bm25TopN(scoredIdx, Seq("dog", "fish"),
      n = 6L, lTotal = 16L, topN = 2).select("id").as[Long].collect().toSeq
    assert(r === Seq(4L, 6L))
  }

  test("build plans a broadcast anti-join for the hot set, no cartesian") {
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast hot-set anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }
}
