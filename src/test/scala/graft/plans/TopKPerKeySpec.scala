package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-operator rewrite: Filter(row_number ≤ k, Window) becomes the
  * heap-based TopKPerKeyExec transparently, with identical results. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def hasTopK(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("TopKPerKey")

  private def topkQuery(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  test("the rewrite fires and matches a naive per-key top-k on random data") {
    val rnd = new scala.util.Random(31)
    val data = (0 until 3000).map(i =>
      (s"g${rnd.nextInt(17)}", rnd.nextInt(1000).toLong, i.toLong))
    val df = data.toDF("g", "v", "id")
    val q = topkQuery(df, 5)
    assert(hasTopK(q), s"rewrite did not fire:\n${q.queryExecution.executedPlan}")
    val got = q.select("g", "v", "id", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).sorted
    val expect = data.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (r._2, r._3)).take(5).zipWithIndex
        .map { case ((_, v, id), i) => (g, v, id, i + 1) }
    }.sorted
    assert(got.toSeq === expect)
  }

  test("descending order and a residual predicate survive the rewrite") {
    val df = (1 to 100).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "v")
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val q = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 && col("v") > 10L)
    assert(hasTopK(q))
    val got = q.select("g", "v", "rn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val expect = (1 to 100).map(i => (s"g${i % 4}", i.toLong))
      .groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.map(_._2).sorted(Ordering[Long].reverse).take(3).zipWithIndex
          .collect { case (v, i) if v > 10 => (g, v, i + 1) }
      }.sorted
    assert(got.toSeq === expect)
  }

  test("nulls order first (Spark default asc) in both forms") {
    val df = Seq(("a", Some(5L)), ("a", None), ("a", Some(1L)), ("b", Some(2L)))
      .toDF("g", "v")
    val w = Window.partitionBy("g").orderBy("v")
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    assert(hasTopK(q))
    val got = q.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) null else r.getLong(1), r.getInt(2))).toSet
    assert(got === Set(("a", null, 1), ("a", 1L, 2), ("b", 2L, 1)))
  }

  test("declines safely: multi-window-column, rank equality, non-constant k") {
    val df = (1 to 50).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v")
    val w = Window.partitionBy("g").orderBy("v")
    // a second window column rides along -> must keep the stock plan
    val multi = df.withColumn("rn", row_number().over(w))
      .withColumn("s", sum(col("v")).over(w)).filter(col("rn") <= 2)
    assert(!hasTopK(multi))
    assert(multi.count() == 6)
    // equality on the rank is not a top-k
    val eq = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 2)
    assert(!hasTopK(eq))
    assert(eq.count() == 3)
  }

  test("global top-k (no partition keys) also rewrites") {
    val df = (1 to 500).map(i => ((i * 37) % 501).toLong).toDF("v")
    val w = Window.orderBy("v")
    val q = df.withColumn("rn", row_number().over(w)).filter(col("rn") < 4)
    assert(hasTopK(q))
    assert(q.select("v").collect().map(_.getLong(0)).sorted.toSeq ===
      (1 to 500).map(i => ((i * 37) % 501).toLong).sorted.take(3))
  }

  test("rank ≤ k keeps boundary ties and matches the stock window") {
    val rnd = new scala.util.Random(47)
    // few distinct values → heavy ties at every boundary
    val data = (0 until 4000).map(i =>
      (s"g${rnd.nextInt(11)}", rnd.nextInt(12).toLong, i.toLong))
    val df = data.toDF("g", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("v"))
    val q = df.withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(hasTopK(q), s"rank rewrite did not fire:\n${q.queryExecution.executedPlan}")
    val got = q.select("g", "v", "id", "r").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getInt(3))).sorted
    // naive oracle: rank = 1 + count of strictly smaller values
    val expect = data.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.collect { case (_, v, id)
        if rs.count(_._2 < v) < 3 => (g, v, id, rs.count(_._2 < v) + 1) }
    }.sorted
    assert(got.toSeq === expect)
  }

  test("dense_rank ≤ k keeps the k smallest distinct values, all rows") {
    val rnd = new scala.util.Random(53)
    val data = (0 until 4000).map(i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(25).toLong, i.toLong))
    val df = data.toDF("g", "v", "id")
    val w = Window.partitionBy("g").orderBy(col("v").desc)
    val q = df.withColumn("r", dense_rank().over(w)).filter(col("r") <= 4)
    assert(hasTopK(q), s"dense_rank rewrite did not fire:\n${q.queryExecution.executedPlan}")
    val got = q.select("g", "v", "id", "r").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getInt(3))).sorted
    val expect = data.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      val distinct = rs.map(_._2).distinct.sorted(Ordering[Long].reverse)
      val keep = distinct.take(4).zipWithIndex.toMap
      rs.collect { case (_, v, id) if keep.contains(v) =>
        (g, v, id, keep(v) + 1) }
    }.sorted
    assert(got.toSeq === expect)
  }

  test("rank modes also decline on equality and multi-window plans") {
    val df = (1 to 60).map(i => (s"g${i % 3}", (i % 9).toLong)).toDF("g", "v")
    val w = Window.partitionBy("g").orderBy("v")
    val eq = df.withColumn("r", rank().over(w)).filter(col("r") === 2)
    assert(!hasTopK(eq))
    val multi = df.withColumn("r", dense_rank().over(w))
      .withColumn("s", sum(col("v")).over(w)).filter(col("r") <= 2)
    assert(!hasTopK(multi))
  }

  test("the physical plan sorts nothing: no Sort node below TopKPerKey") {
    val df = (1 to 100).map(i => (s"g${i % 4}", i.toLong)).toDF("g", "v")
    val q = topkQuery(df.withColumn("id", col("v")), 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Sort "), s"heap operator must not plan a sort:\n$plan")
  }
}
