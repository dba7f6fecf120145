package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Target (t=true) is all-"cat dog"; raw docs range from target-like to
  // alien. Small bucket count keeps the hand model tractable while still
  // exercising the real hash path (B=512 is injective on this vocabulary).
  private def corpus = Seq(
    (1L, "cat dog cat", true), (2L, "cat dog", true),
    (10L, "cat dog dog", false), (11L, "cat fish", false),
    (12L, "zebra quark boson", false)).toDF("doc_id", "text", "tgt")

  /** Driver-side recompute of the smoothed ratio model over WORDS (the
    * bucket hash is injective on this vocabulary at B=512 — asserted). */
  private def handScores(buckets: Int): Map[Long, (Long, Double)] = {
    val tgtToks = Seq("cat", "dog", "cat", "cat", "dog")
    val rawDocs = Map(
      10L -> Seq("cat", "dog", "dog"),
      11L -> Seq("cat", "fish"),
      12L -> Seq("zebra", "quark", "boson"))
    val rawToks = rawDocs.values.flatten.toSeq
    val ct = tgtToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = rawToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (tgtToks.size.toDouble, rawToks.size.toDouble)
    rawDocs.map { case (id, ts) =>
      val types = ts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val s = types.map { case (w, m) =>
        m * (((ct.getOrElse(w, 0L) + 1.0) * (nr + buckets)) /
          ((cr(w) + 1.0) * (nt + buckets)))
      }.sum / ts.size
      id -> (ts.size.toLong, math.rint(s * 1e4) / 1e4)
    }
  }

  test("importanceScore matches the hand-computed smoothed ratio model") {
    val b = 512
    // precondition for the word-level hand model: no bucket collisions
    val buckets = corpus.select(explode(split(col("text"), " ")).as("w"))
      .distinct()
      .select(col("w"), (graft.functions.TextFunctions.shaHash32(col("w")) % b).as("bk"))
      .collect()
    assert(buckets.map(_.getLong(1)).distinct.length === buckets.length,
      "hash collision in the test vocabulary — pick a different B")
    val got = Dsir.importanceScore(corpus, "doc_id", "text", col("tgt"),
        buckets = b).orderBy("id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = handScores(b)
    assert(got.keySet === want.keySet)
    for ((id, (n, s)) <- want) {
      assert(got(id)._1 === n)
      assert(got(id)._2 === s +- 1e-9, s"doc $id")
    }
  }

  test("target-like raw docs outscore alien ones, and only raw docs appear") {
    val r = Dsir.importanceScore(corpus, "doc_id", "text", col("tgt"))
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r.keySet === Set(10L, 11L, 12L)) // never the target docs
    assert(r(10L) > r(11L) && r(11L) > r(12L),
      s"expected cat-dog > cat-fish > zebra-quark, got $r")
  }

  test("selectTopK is a deterministic (iw desc, id) prefix") {
    val scored = Dsir.importanceScore(corpus, "doc_id", "text", col("tgt"))
    val top2 = Dsir.selectTopK(scored, 2).collect().map(_.getLong(0)).toSet
    assert(top2 === Set(10L, 11L))
    // stability across runs (fold order + tie-break are total)
    assert(Dsir.selectTopK(scored, 2).collect().map(_.getLong(0)).toSet === top2)
  }

  test("logImportance matches a driver-side log recompute and agrees on ranking") {
    val b = 512
    val lw = Dsir.logImportance(corpus, "doc_id", "text", col("tgt"),
        buckets = b)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // hand model in log space over words (injective hash asserted above)
    val tgtToks = Seq("cat", "dog", "cat", "cat", "dog")
    val rawDocs = Map(
      10L -> Seq("cat", "dog", "dog"),
      11L -> Seq("cat", "fish"),
      12L -> Seq("zebra", "quark", "boson"))
    val rawToks = rawDocs.values.flatten.toSeq
    val ct = tgtToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = rawToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (tgtToks.size.toDouble + b, rawToks.size.toDouble + b)
    for ((id, ts) <- rawDocs) {
      val want = ts.groupBy(identity).map { case (w, occ) =>
        occ.size * (math.log((ct.getOrElse(w, 0L) + 1.0) / nt) -
          math.log((cr(w) + 1.0) / nr))
      }.sum
      assert(lw(id) === want +- 1e-9, s"doc $id")
    }
    assert(lw(10L) > lw(11L) && lw(11L) > lw(12L))
  }

  test("gumbelTopK is seed-deterministic and seed-sensitive") {
    // widen the corpus so two seeds have room to disagree
    val docs = ((1 to 5).map(i => (i.toLong, "cat dog", true)) ++
      (10 to 40).map(i => (i.toLong, s"cat tok$i filler$i", false)))
      .toDF("doc_id", "text", "tgt")
    val lw = Dsir.logImportance(docs, "doc_id", "text", col("tgt"))
    def pick(seed: Long) =
      Dsir.gumbelTopK(lw, 5, seed).collect().map(_.getLong(0)).toSeq
    assert(pick(7L) === pick(7L)) // replayable
    assert(pick(7L) !== pick(8L), "two seeds drew identical samples")
  }

  test("empty target corpus fails loudly") {
    intercept[IllegalArgumentException] {
      Dsir.importanceScore(corpus, "doc_id", "text", lit(false))
    }
  }
}
