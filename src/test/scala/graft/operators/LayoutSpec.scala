package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout (Layout / q_zorder): curve arithmetic, planning-set
  * correctness, and the plan property — a 2-D box over a zBucket layout
  * prunes at the DIRECTORY level before any row is read. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue column expression equals the scalar Morton twin") {
    val bits = 6
    val grid = for (a <- 0L until 64L by 7; b <- 0L until 64L by 5) yield (a, b)
    val got = grid.toDF("a", "b")
      .withColumn("z", Layout.zValue(col("a"), col("b"), bits))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((a, b) <- grid)
      assert(got((a, b)) === Layout.zValueScalar(a, b, bits),
        s"zValue($a,$b) diverged from scalar")
  }

  test("zValue is a bijection on the grid and zBucket is its prefix") {
    val bits = 5
    val all = for (a <- 0L until 32L; b <- 0L until 32L) yield (a, b)
    val zs = all.map { case (a, b) => Layout.zValueScalar(a, b, bits) }
    assert(zs.toSet.size === all.size, "Morton code must be injective")
    assert(zs.min === 0L && zs.max === (1L << (2 * bits)) - 1,
      "Morton code must cover exactly [0, 4^bits)")
    // coarse bucket = z div 4^(bits-gridBits) — the curve prefix
    val gridBits = 2
    for ((a, b) <- all.take(200)) {
      val fine = Layout.zValueScalar(a, b, bits)
      val coarse = Layout
        .zValueScalar(a >> (bits - gridBits), b >> (bits - gridBits), gridBits)
      assert(coarse === fine >> (2 * (bits - gridBits)),
        s"bucket must be the curve prefix at ($a,$b)")
    }
  }

  test("bucketsForBox equals the brute-force bucket set of the box") {
    val bits = 8
    val gridBits = 3
    val (aLo, aHi, bLo, bHi) = (37L, 150L, 90L, 200L)
    val brute = (for (a <- aLo to aHi; b <- bLo to bHi) yield {
      val cell = 1L << (bits - gridBits)
      Layout.zValueScalar(a / cell, b / cell, gridBits)
    }).distinct.sorted
    assert(Layout.bucketsForBox(aLo, aHi, bLo, bHi, bits, gridBits) === brute)
  }

  test("box query over the layout prunes non-matching bucket dirs") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_layout_spec_").toString
    val bits = 8
    val gridBits = 2 // 16 buckets
    val df = spark.range(0, 4096).select(
      (col("id") % 256).as("a"), ((col("id") * 31) % 256).as("b"),
      col("id").as("v"))
    Layout.writeZOrdered(df, col("a"), col("b"), bits, gridBits, work)

    val (aLo, aHi, bLo, bHi) = (0L, 60L, 70L, 120L) // 2 cells of the 4x4 grid
    val buckets = Layout.bucketsForBox(aLo, aHi, bLo, bHi, bits, gridBits)
    assert(buckets.size < (1 << (2 * gridBits)),
      "test box must not cover every bucket")
    val q = spark.read.parquet(work)
      .filter(col("zb").isin(buckets: _*))
      .filter(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
    val plan = q.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("zb"), s"bucket predicate must reach PartitionFilters, got '$pf'")

    // pruning must not change the answer
    val expect = df.filter(col("a").between(aLo, aHi) &&
      col("b").between(bLo, bHi)).count()
    assert(q.count() === expect)

    // physical check: strictly fewer files than the layout holds
    val q2 = spark.read.parquet(work).filter(col("zb").isin(buckets: _*))
    q2.collect() // executes THIS plan instance, so its scan metric is live
    val numFiles = q2.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value).sum
    val totalFiles = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(work))
      try s.filter(_.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    assert(numFiles >= 1 && numFiles < totalFiles,
      s"expected a pruned scan ($numFiles of $totalFiles files)")
  }

  test("rows are z-sorted within each written file (row-group clustering)") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_layout_sort_spec_").toString
    val bits = 8
    val df = spark.range(0, 2048).select(
      ((col("id") * 17) % 256).as("a"), ((col("id") * 31) % 256).as("b"))
    Layout.writeZOrdered(df, col("a"), col("b"), bits, 2, work)
    val byFile = spark.read.parquet(work)
      .withColumn("z", Layout.zValue(col("a"), col("b"), bits))
      .withColumn("f", input_file_name())
      .select("f", "z")
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)))
    for ((f, zs) <- byFile)
      assert(zs.sameElements(zs.sorted), s"file $f not z-sorted")
  }

  test("compactFiles collapses file count, preserves content, and never shuffles") {
    val in = java.nio.file.Files.createTempDirectory("graft_compact_in_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact_out_").toString
    spark.range(0, 10000).select(col("id"), (col("id") % 97).as("v"))
      .repartition(40).write.mode("overwrite").parquet(in)
    val (nIn, nOut) = Layout.compactFiles(spark, in, out, 1L << 30)
    assert(nIn == 40 && nOut == 1, s"got ($nIn, $nOut)")
    val outFiles = new java.io.File(out).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(outFiles == 1, s"expected 1 output file, got $outFiles")
    // content identity (modulo order)
    val a = spark.read.parquet(in).orderBy("id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(a === b)
    // the rewrite plan is scan -> coalesce -> write: no Exchange
    val plan = spark.read.parquet(in).coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compaction must not shuffle:\n$plan")
  }

  test("compactFiles sizes the output by targetBytes") {
    val in = java.nio.file.Files.createTempDirectory("graft_compact_sz_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact_sz_o_").toString
    spark.range(0, 50000).select(col("id"),
        concat(lit("pad_pad_pad_"), col("id")).as("s"))
      .repartition(20).write.mode("overwrite").parquet(in)
    val total = new java.io.File(in).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    val target = total / 3 + 1
    val (_, nOut) = Layout.compactFiles(spark, in, out, target)
    assert(nOut == 3, s"expected ceil split into 3, got $nOut")
  }
}
