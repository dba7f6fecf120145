package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def sampleDf = {
    // two groups with known order statistics: g=a holds 1..100,
    // g=b holds 1000, 2000, ..., 10000
    val a = (1 to 100).map(i => ("a", i.toDouble))
    val b = (1 to 10).map(i => ("b", i * 1000.0))
    (a ++ b).toDF("g", "v")
  }

  test("exactQuantiles picks the value at rank ceil(p*n)") {
    val r = rows(Stats.exactQuantiles(sampleDf, "g", "v", Seq(0.5, 0.9, 0.99))
      .orderBy("g"))
    // a: n=100 → ranks 50, 90, 99; b: n=10 → ranks 5, 9, 10
    assert(r === Seq(Seq("a", 50.0, 90.0, 99.0),
      Seq("b", 5000.0, 9000.0, 10000.0)))
  }

  test("exactQuantiles: ties make the picked VALUE deterministic anyway") {
    val df = Seq.fill(10)(("g", 7.0)).toDF("g", "v")
    val r = rows(Stats.exactQuantiles(df, "g", "v", Seq(0.5)))
    assert(r === Seq(Seq("g", 7.0)))
  }

  test("exactQuantiles plans ONE exchange: the agg reuses the window partitioning") {
    val plan = Stats.exactQuantiles(sampleDf, "g", "v", Seq(0.5))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, plan:\n$plan")
  }

  test("approxQuantiles tracks the exact operator within sketch rank error") {
    // GK sketch with accuracy A guarantees rank error ≤ n/A; with
    // A=10000 and n=100 the answer is rank-exact here, but assert the
    // CONTRACT (value between the p±ε order statistics), not equality,
    // so a sketch-implementation change doesn't flap the suite
    val exact = Stats.exactQuantiles(sampleDf, "g", "v", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = Stats.approxQuantiles(sampleDf, "g", "v", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val sorted = sampleDf.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    for ((g, (a50, a90)) <- approx) {
      val vs = sorted(g)
      val n = vs.length
      def bound(p: Double, got: Double) = {
        val eps = math.max(1, n / 10000) // rank slack at this accuracy
        val lo = vs(math.max(0, math.ceil(p * n).toInt - 1 - eps))
        val hi = vs(math.min(n - 1, math.ceil(p * n).toInt - 1 + eps))
        got >= lo && got <= hi
      }
      assert(bound(0.5, a50) && bound(0.9, a90),
        s"approx quantiles out of rank bound for $g: $a50/$a90 vs ${exact(g)}")
    }
  }

  test("histogram bins by fixed width with explicit under/overflow bins") {
    val df = Seq(("g", -5.0), ("g", 0.0), ("g", 9.9), ("g", 10.0), ("g", 25.0),
      ("g", 99.9), ("g", 100.0), ("g", 250.0)).toDF("g", "v")
    val r = Stats.histogram(df, "g", "v", lo = 0.0, width = 10.0, nBins = 10)
      .orderBy("bin").as[(String, Long, Long)].collect().toSeq
    assert(r === Seq(("g", -1L, 1L),  // -5 underflows
      ("g", 0L, 2L),                  // 0.0, 9.9
      ("g", 1L, 1L),                  // 10.0 lands in the NEXT bin (floor)
      ("g", 2L, 1L),                  // 25.0
      ("g", 9L, 1L),                  // 99.9 in the last real bin
      ("g", 10L, 2L)))                // 100.0 and 250.0 overflow
  }

  test("approxDistinct tracks exact count(DISTINCT) within rsd tolerance") {
    val df = (0L until 20000L).map(i => (s"g${i % 2}", i % (1000 + (i % 2).toInt * 2000)))
      .toDF("g", "v")
    val exact = df.groupBy("g").agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    val approx = Stats.approxDistinct(df, "g", "v", rsd = 0.02)
      .as[(String, Long)].collect().toMap
    for ((g, n) <- exact) {
      val a = approx(g)
      assert(math.abs(a - n).toDouble / n <= 0.06, // 3x rsd — never flaps
        s"group $g: approx $a vs exact $n")
    }
  }

  test("heavyHitters finds every value above n/(k+1) within the MG error bound") {
    // zipf-ish: value i appears 2^(12-i) times for i in 1..8, plus a tail
    // of 500 singletons — n = 8160, so with k=9 the threshold n/(k+1)=816
    // guarantees values 1..3 (4096/2048/1024); 4 (512) may or may not
    // surface depending on merge order, and that's the contract
    val rows = (1 to 8).flatMap(i => Seq.fill(1 << (12 - i))(s"v$i")) ++
      (1 to 500).map(i => s"tail$i")
    val n = rows.size.toLong
    val k = 9
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v")
    val hh = Stats.heavyHitters(df, "v", k).toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (k + 1)
    for (v <- Seq("v1", "v2", "v3")) {
      assert(hh.contains(v), s"$v (freq ${exact(v)} > $bound) must be present")
    }
    for ((v, c) <- hh) {
      // counts underestimate by at most n/(k+1), never overestimate
      assert(c <= exact(v), s"$v overestimated: $c > ${exact(v)}")
      assert(exact(v) - c <= bound, s"$v error ${exact(v) - c} > $bound")
    }
    assert(hh.size <= k)
  }

  test("heavyHitters summary stays k-bounded on all-distinct input") {
    val df = (1L to 5000L).map(i => s"u$i").toDF("v")
    val hh = Stats.heavyHitters(df, "v", 5)
    assert(hh.size <= 5)
    // no value exceeds n/(k+1), so NOTHING is guaranteed — but whatever
    // survives must respect the no-overestimate rule (true freq 1)
    assert(hh.forall(_._2 <= 1L))
  }

  test("groupSample caps each group at k, deterministically") {
    val df = (1L to 500L).map(i => (s"s${i % 3}", i)).toDF("src", "id")
    val once = rows(Stats.groupSample(df, "src", "id", 20).orderBy("src", "id"))
    val twice = rows(Stats.groupSample(df, "src", "id", 20).orderBy("src", "id"))
    assert(once === twice)
    val sizes = Stats.groupSample(df, "src", "id", 20)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(sizes.values.forall(_ == 20L))
    // hash-rank, not head-of-table: the sample is not just ids 1..k
    val ids = once.map(_(1).asInstanceOf[Long])
    assert(ids.exists(_ > 100L))
  }

  test("temperatureMix takes per-source counts proportional to sqrt(n)") {
    // sources sized 6400/1600/400: sqrt weights 80/40/20 → of a
    // 700-doc budget: 400/200/100
    val df = ((1L to 6400L).map(("big", _)) ++
      (6401L to 8000L).map(("mid", _)) ++
      (8001L to 8400L).map(("small", _))).toDF("src", "id")
    val taken = Stats.temperatureMix(df, "src", "id", 700L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(taken === Map("big" -> 400L, "mid" -> 200L, "small" -> 100L))
  }

  test("temperatureMix caps the take at the source size, never overshoots budget") {
    // tiny source whose fair share exceeds its size: take = all of it
    val df = ((1L to 10000L).map(("big", _)) ++
      (10001L to 10005L).map(("tiny", _))).toDF("src", "id")
    val taken = Stats.temperatureMix(df, "src", "id", 5000L)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(taken("tiny") === 5L)
    assert(taken.values.sum <= 5000L)
  }

  test("temperatureMix is deterministic and a subset of the input") {
    val df = (1L to 900L).map(i => (s"s${i % 4}", i)).toDF("src", "id")
    val once = rows(Stats.temperatureMix(df, "src", "id", 300L).orderBy("id"))
    val twice = rows(Stats.temperatureMix(df, "src", "id", 300L).orderBy("id"))
    assert(once === twice)
    assert(once.nonEmpty && once.size <= 300)
    val ids = once.map(_(1).asInstanceOf[Long]).toSet
    assert(ids.subsetOf((1L to 900L).toSet))
  }

  test("zOutliers: exact threshold cells are NOT flagged (strict >)") {
    // group of 2: x ∈ {0, 2} → μ=1, σ=1; z=1 ⇒ |x−μ| = σ exactly → keep
    val df = Seq(("g", 0L), ("g", 2L)).toDF("grp", "x")
    val got = Stats.zOutliers(df, "grp", "x", 1L, 1L)
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(got === Map(0L -> false, 2L -> false))
    // z = 1/2 ⇒ threshold σ/2 < σ → both flagged
    val got2 = Stats.zOutliers(df, "grp", "x", 1L, 2L)
      .collect().map(r => r.getLong(1) -> r.getBoolean(2)).toMap
    assert(got2 === Map(0L -> true, 2L -> true))
  }

  test("zOutliers flags the spike and nothing else; zero variance flags none") {
    val cells = ((1 to 20).map(i => ("a", 100L + (i % 2))) :+ (("a", 500L))) ++
      (1 to 5).map(_ => ("flat", 7L))
    val got = Stats.zOutliers(cells.toDF("grp", "x"), "grp", "x", 3L, 1L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getBoolean(2))
    assert(got.count { case ((g, x), f) => f } == 1)
    assert(got.contains(("a", 500L) -> true))
    assert(got.filter(_._1._1 == "flat").forall(!_._2))
  }

  private def bruteSkyline(pts: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pts.filter(a => !pts.exists(b =>
      b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)))

  test("skyline2d equals the quadratic dominance filter on random points") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val pts = (0 until 400).map(_ =>
        (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      val got = Stats.skyline2d(pts.toDF("x", "y"), "x", "y", 100L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === bruteSkyline(pts).sorted, s"trial $trial")
    }
  }

  test("skyline2d: duplicates of a skyline point all survive; equal-x dominated drop") {
    val pts = Seq((1L, 10L), (1L, 10L), (1L, 5L), (2L, 11L), (3L, 10L))
    val got = Stats.skyline2d(pts.toDF("x", "y"), "x", "y", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // (1,5) dominated by (1,10); (3,10) dominated by (1,10); dups kept
    assert(got === Seq((1L, 10L), (1L, 10L), (2L, 11L)))
  }

  test("skyline2d prefilter prunes in the scan stage (no quadratic join)") {
    val pts = (0 until 2000).map(i => (i.toLong, (i % 37).toLong))
    val plan = Stats.skyline2d(pts.toDF("x", "y"), "x", "y", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"skyline must not plan a quadratic join:\n$plan")
  }
}
