package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 'a'×50, 'b'×20, 'c'×5, plus 25 distinct rare values ('r0'..'r24')
  private def valuesDf =
    (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++ Seq.fill(5)("c") ++
      (0 until 25).map(i => s"r$i")).toDF("v")

  test("cms estimates never underestimate and hit exact counts when sparse") {
    val depth = 4
    val width = 256
    val sk = Sketches.cmsBuild(valuesDf, "v", depth, width)
    val probes = Seq("a", "b", "c", "r0", "never-seen").toDF("p")
    val est = Sketches.cmsEstimate(probes, "p", sk, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 50L, "b" -> 20L, "c" -> 5L, "r0" -> 1L, "never-seen" -> 0L)
    for ((p, n) <- exact) {
      assert(est(p) >= n, s"CMS underestimated $p: ${est(p)} < $n")
      // 100 items into 4×256 cells: collisions possible but each adds
      // at most the colliding value's count; assert the CMS error bound
      // e·n/width rather than exact equality
      assert(est(p) <= n + (3 * 100) / width + 1,
        s"CMS estimate for $p out of bound: ${est(p)} vs exact $n")
    }
  }

  test("sketch size is bounded by depth*width regardless of input size") {
    val sk = Sketches.cmsBuild(valuesDf, "v", 4, 16)
    assert(sk.count() <= 4 * 16)
    // every value lands in exactly one cell per row
    val perRow = sk.groupBy("row").agg(sum("n").as("t"))
      .collect().map(_.getLong(1)).toSet
    assert(perRow === Set(100L), "each hash row must count every occurrence once")
  }

  test("cell assignment is deterministic and engine-portable (non-negative mod)") {
    val a = Sketches.cmsBuild(valuesDf, "v", 2, 64).orderBy("row", "cell")
    val b = Sketches.cmsBuild(valuesDf, "v", 2, 64).orderBy("row", "cell")
    assert(rows(a) === rows(b))
    assert(a.filter(col("cell") < 0 || col("cell") >= 64).isEmpty,
      "cells must lie in [0, width)")
  }

  test("probe plan broadcasts the sketch (no shuffle of the probe side)") {
    val sk = Sketches.cmsBuild(valuesDf, "v", 4, 256)
    val plan = Sketches.cmsEstimate(Seq("a").toDF("p"), "p", sk, 4, 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  // ------------------------------------------------------------- Bloom
  test("bloom never reports a false negative, at any parameterization") {
    for ((m, k) <- Seq((256, 3), (63, 1), (4096, 7))) {
      val seen = (0 until 40).map(i => s"key$i").toDF("v")
      val bloom = Sketches.bloomBuild(seen, "v", m, k)
      val got = Sketches.bloomMightContain(seen, "v", bloom, m, k)
        .filter(!col("might_contain")).count()
      assert(got === 0, s"false negatives at m=$m k=$k")
    }
  }

  test("bloom false-positive rate stays near theory for a roomy bitmap") {
    val seen = (0 until 100).map(i => s"in$i").toDF("v")
    val m = 2048
    val k = 5
    val bloom = Sketches.bloomBuild(seen, "v", m, k)
    val absent = (0 until 500).map(i => s"out$i").toDF("v")
    val fps = Sketches.bloomMightContain(absent, "v", bloom, m, k)
      .filter(col("might_contain")).count()
    // theory: (1 - e^(-kn/m))^k ≈ 0.0043 → expect ~2 of 500; allow 10×
    assert(fps <= 20, s"implausible false-positive count $fps/500")
  }

  test("bitmap is bounded by ceil(m/63) words and masks stay positive") {
    val seen = (0 until 1000).map(i => s"v$i").toDF("v")
    val m = 630
    val bloom = Sketches.bloomBuild(seen, "v", m, 4)
    assert(bloom.count() <= (m + 62) / 63)
    assert(bloom.filter(col("word") < 0 || col("word") >= (m + 62) / 63).isEmpty)
    // bits are ORs of 1<<(0..62): always strictly positive
    assert(bloom.filter(col("bits") <= 0).isEmpty,
      "no mask may touch the sign bit (engine-portable arithmetic)")
  }

  test("bloom probe broadcasts the bitmap") {
    val seen = (0 until 40).map(i => s"key$i").toDF("v")
    val bloom = Sketches.bloomBuild(seen, "v", 256, 3)
    val plan = Sketches.bloomMightContain(Seq("key1").toDF("v"), "v", bloom, 256, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("bloomLiteralMightContain: no false negatives; fp rate near theory; scan-stage only") {
    val keys = (1 to 50).map(i => s"key$i").toDF("v")
    val mBits = 4032; val k = 3
    val words = Sketches.bloomBitmapWords(
      Sketches.bloomBuild(keys, "v", mBits, k), mBits)
    assert(words.length == 64)
    // every inserted key answers true (no false negatives, ever)
    val hits = keys.filter(Sketches.bloomLiteralMightContain(words, col("v"), mBits, k))
    assert(hits.count() == 50)
    // fp rate on 2000 absent probes ≈ (1 − e^(−kn/m))^k ≈ 0.004% — allow slack
    val absent = (1 to 2000).map(i => s"other$i").toDF("v")
    val fp = absent.filter(Sketches.bloomLiteralMightContain(words, col("v"), mBits, k)).count()
    assert(fp <= 10, s"false-positive count $fp far above theory")
    // the probe is a pure filter: no join node anywhere in the plan
    val plan = absent.filter(Sketches.bloomLiteralMightContain(words, col("v"), mBits, k))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"literal bloom probe must not join:\n$plan")
  }

  test("bloom prefilter + exact join is result-identical to the plain join") {
    val keys = (1 to 30 by 3).map(i => i.toLong).toDF("k")
    val probe = (1 to 200).map(i => (i.toLong % 40)).toDF("p")
    val mBits = 63 * 4; val k = 2 // tiny bitmap → real false positives
    val words = Sketches.bloomBitmapWords(
      Sketches.bloomBuild(keys, "k", mBits, k), mBits)
    val pruned = probe
      .filter(Sketches.bloomLiteralMightContain(words, col("p"), mBits, k))
      .join(keys, col("p") === col("k"), "left_semi")
      .orderBy("p").collect().map(_.getLong(0)).toSeq
    val plain = probe.join(keys, col("p") === col("k"), "left_semi")
      .orderBy("p").collect().map(_.getLong(0)).toSeq
    assert(pruned === plain)
  }

  test("segmentBitmaps/segmentOverlap: exact intersections, word-boundary ids, empty pairs omitted") {
    val df = Seq(
      ("a", 0L), ("a", 62L), ("a", 63L), ("a", 100L), ("a", 100L), // dup id
      ("b", 62L), ("b", 63L), ("b", 500L),
      ("c", 0L), ("c", 7L)  // c∩a = {0}; c∩b = ∅ (must be omitted)
    ).toDF("seg", "uid")
    val bm = Sketches.segmentBitmaps(df, "seg", "uid")
    // word boundaries: 62 and 63 land in different words
    val aWords = bm.filter(col("seg") === "a").collect()
      .map(r => r.getLong(1)).sorted
    assert(aWords.toSeq === Seq(0L, 1L))
    val got = Sketches.segmentOverlap(bm).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 2L, ("a", "c") -> 1L),
      "b∩c shares words but no bits and must be omitted; dup memberships count once")
  }

  test("segmentOverlap matches the naive distinct join on random memberships") {
    val rnd = new scala.util.Random(53)
    val rows = (0 until 2000).map(_ => (s"s${rnd.nextInt(6)}", rnd.nextInt(300).toLong))
    val got = Sketches.segmentOverlap(
        Sketches.segmentBitmaps(rows.toDF("seg", "uid"), "seg", "uid"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val m = rows.distinct.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val naive = (for {
      a <- m.keys; b <- m.keys if a < b
      n = (m(a) & m(b)).size if n > 0
    } yield (a, b) -> n.toLong).toMap
    assert(got === naive)
  }

  test("hllRegisters: bucket/rho replay the hash arithmetic; dedup by max") {
    val df = Seq(("g", "x"), ("g", "x"), ("g", "y")).toDF("grp", "v")
    val regs = Sketches.hllRegisters(df, "grp", "v", 6)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // replicate: h = first 8 sha256 hex chars of "hll:<v>"; bucket=h%64
    def parts(v: String): (Long, Long) = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"hll:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val rest = h >> 6
      val rho = if (rest == 0) 27L
        else 26L - (java.lang.Long.toBinaryString(rest).length - 1)
      (h % 64, rho)
    }
    val (bx, rx) = parts("x"); val (by, ry) = parts("y")
    val expect = Seq(("g", bx) -> rx, ("g", by) -> ry)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    assert(regs === expect)
  }

  test("hllRegisters is bounded by 2^b rows per group; max-rho survives") {
    val df = (1 to 5000).map(i => ("g", s"v$i")).toDF("grp", "v")
    val regs = Sketches.hllRegisters(df, "grp", "v", 6).collect()
    assert(regs.length <= 64)
    assert(regs.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    assert(regs.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 27))
  }

  test("hllEstimate lands within tolerance of the exact distinct count") {
    // deterministic (sha hashes): fixed corpus, fixed estimate
    for ((n, tol) <- Seq((100, 0.3), (2000, 0.25), (20000, 0.25))) {
      val df = (1 to n).map(i => ("g", s"user$i")).toDF("grp", "v")
      val est = Sketches.hllEstimate(
        Sketches.hllRegisters(df, "grp", "v", 6), "grp", 6)
        .head().getDouble(1)
      assert(math.abs(est - n) <= tol * n,
        s"estimate $est for true $n beyond ${tol * 100}%")
    }
  }

  test("hllEstimate small-range linear counting engages when registers are sparse") {
    val df = (1 to 5).map(i => ("g", s"v$i")).toDF("grp", "v")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(df, "grp", "v", 6), "grp", 6)
      .head().getDouble(1)
    assert(est >= 3 && est <= 8, s"linear-counting estimate $est off for 5")
  }
}
