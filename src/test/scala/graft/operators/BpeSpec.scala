package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def wrapped(texts: String*) =
    texts.toDF("text").select(Bpe.wrap(split(col("text"), " ")).as("s"))

  test("wrap/unwrap round-trip, empty array, single token") {
    val df = Seq("a b c", "x").toDF("text")
      .select(Bpe.unwrap(Bpe.wrap(split(col("text"), " "))).as("t"))
    assert(rows(df) === Seq(Seq(Seq("a", "b", "c")), Seq(Seq("x"))))
    val empty = Seq(Tuple1(Array.empty[String])).toDF("t")
      .select(Bpe.unwrap(Bpe.wrap(col("t"))).as("r"))
    assert(rows(empty) === Seq(Seq(Seq())))
  }

  test("pairCounts counts adjacent pairs, overlapping runs count every slot") {
    // "a a a" holds pairs (a,a) twice — counting is per SLOT; the
    // left-to-right MERGE later collapses only the leftmost
    val c = Bpe.pairCounts(wrapped("a a a", "a b"), "s")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(c === Map(("a", "a") -> 2L, ("a", "b") -> 1L))
  }

  test("trainMerges learns the expected sequence on a hand-computable corpus") {
    // corpus: "x y x y z" ×3, "x y w" ×2 → (x,y) appears 8 slots.
    // After merging (x,y): "xy xy z" ×3, "xy w" ×2 → top pair is
    // ("x y","x y") cnt 3 (ties ("x y",z)=3? no: pairs per doc1:
    // (xy,xy), (xy,z) → both 3; tie broken by b: "x y" < "z")
    val docs = wrapped(Seq.fill(3)("x y x y z") ++ Seq.fill(2)("x y w"): _*)
    val m = Bpe.trainMerges(docs, "s", 2)
    assert(m.map(x => (x.step, x.a, x.b, x.cnt)) ===
      Seq((1, "x", "y", 8L), (2, "x y", "x y", 3L)))
  }

  test("merge semantics are greedy left-to-right: 'a a a' collapses once") {
    val df = wrapped("a a a")
      .select(Bpe.unwrap(Bpe.applyMerge(col("s"), "a", "a")).as("t"))
    assert(rows(df) === Seq(Seq(Seq("a a", "a"))))
  }

  test("applyMerges replays the learned merges in step order") {
    val docs = wrapped(Seq.fill(3)("x y x y z") ++ Seq.fill(2)("x y w"): _*)
    val m = Bpe.trainMerges(docs, "s", 2)
    val re = docs.select(Bpe.unwrap(Bpe.applyMerges(col("s"), m)).as("t"))
      .as[Seq[String]].collect()
    assert(re.count(_ == Seq("x y x y", "z")) === 3)
    assert(re.count(_ == Seq("x y", "w")) === 2)
  }

  test("trainMerges stops early when the corpus has no pairs left") {
    val docs = wrapped("a b")
    val m = Bpe.trainMerges(docs, "s", 10)
    // (a,b) merges; the single-token docs then hold no pairs
    assert(m.size === 1 && m.head.a === "a" && m.head.b === "b")
  }

  test("batched training equals sequential on a token-disjoint corpus") {
    // top pairs (a,b) cnt 5, (c,d) cnt 4, (e,f) cnt 3 — pairwise
    // token-disjoint, so one batch of 3 must equal three sequential steps
    val docs = wrapped(
      (Seq.fill(5)("a b") ++ Seq.fill(4)("c d") ++ Seq.fill(3)("e f")): _*)
    val seqM = Bpe.trainMerges(docs, "s", 3)
    val batM = Bpe.trainMergesBatched(docs, "s", 3, batch = 3)
    assert(batM === seqM)
  }

  test("applyMergesFast equals the fold on learned merges (incl. chained merges)") {
    val corpus = Seq.fill(3)("x y x y z") ++ Seq.fill(2)("x y w") ++
      Seq("a a a", "q r s t", "x", "") // overlap run, no-merge doc, single, empty
    val docs = wrapped(corpus.filter(_.nonEmpty): _*)
    val m = Bpe.trainMerges(docs, "s", 3)
    assert(m.size === 3)
    val both = docs.select(
        Bpe.unwrap(Bpe.applyMerges(col("s"), m)).as("slow"),
        Bpe.applyMergesFast(Bpe.unwrap(col("s")), m).as("fast"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (slow, fast) => assert(fast === slow) }
  }

  test("applyMergesFast: rank order wins over position (lowest rank merges first)") {
    // merges: rank 1 (b,c), rank 2 (a,b). "a b c": the fold gives
    // a + (b c) — (a,b) is gone by the time rank 2 runs; the heap must
    // reproduce that even though (a,b) sits further left.
    val m = Seq(Bpe.Merge(1, "b", "c", 9L), Bpe.Merge(2, "a", "b", 5L))
    val r = Seq(Tuple1(Seq("a", "b", "c"))).toDF("t")
      .select(Bpe.applyMergesFast(col("t"), m).as("r"))
      .as[Seq[String]].head()
    assert(r === Seq("a", "b c"))
  }

  test("applyMergesFast differential: 200 random small-vocab docs, 12 merges") {
    // 4-token vocabulary forces dense pair collisions and chained merges
    // (merged tokens re-merging) — the regime where a heap bug diverges
    val rng = new scala.util.Random(42)
    val corpus = Seq.fill(200)(
      Seq.fill(3 + rng.nextInt(20))("pqrs".charAt(rng.nextInt(4)).toString)
        .mkString(" "))
    val docs = wrapped(corpus: _*)
    val m = Bpe.trainMerges(docs, "s", 12)
    assert(m.size === 12)
    val both = docs.select(
        Bpe.unwrap(Bpe.applyMerges(col("s"), m)).as("slow"),
        Bpe.applyMergesFast(Bpe.unwrap(col("s")), m).as("fast"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (slow, fast) => assert(fast === slow) }
  }

  test("batched training skips token-sharing pairs within a round") {
    // (a,b) cnt 4 and (b,c) cnt 3 share b: one round may only take
    // (a,b); (b,c) must wait for the next round's recount
    val docs = wrapped(Seq.fill(4)("a b") ++ Seq.fill(3)("b c"): _*)
    val m = Bpe.trainMergesBatched(docs, "s", 2, batch = 2)
    assert(m.head.a === "a" && m.head.b === "b" && m.head.cnt === 4L)
    assert(m(1).a === "b" && m(1).b === "c" && m(1).cnt === 3L)
  }
}
