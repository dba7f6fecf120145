package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Int8Spec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8: known codes, scale = max|x|/127, half-away rounding") {
    val r = Seq((1L, Seq(1.0f, -0.5f, 0.25f)))
      .toDF("id", "v")
      .select(Similarity.quantizeInt8(col("v")).as("qz"))
      .select(col("qz.q"), col("qz.scale"))
      .as[(Seq[Int], Double)].head()
    // scale = 1/127; codes: 1.0→127, -0.5→-63.5→-64 (away from zero),
    // 0.25→31.75→32
    assert(r._1 === Seq(127, -64, 32))
    assert(math.abs(r._2 - 1.0 / 127.0) < 1e-15)
  }

  test("quantizeInt8 zero vector: scale 0, all-zero codes") {
    val r = Seq((1L, Seq(0.0f, 0.0f)))
      .toDF("id", "v")
      .select(Similarity.quantizeInt8(col("v")).as("qz"))
      .select(col("qz.q"), col("qz.scale"))
      .as[(Seq[Int], Double)].head()
    assert(r._1 === Seq(0, 0) && r._2 === 0.0)
  }

  test("dequantize reconstruction error is bounded by scale/2 per component") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val rows = vecs.toDF("id", "v")
      .select(col("v"),
        Similarity.dequantizeInt8(Similarity.quantizeInt8(col("v"))).as("r"),
        Similarity.quantizeInt8(col("v")).getField("scale").as("s"))
      .as[(Seq[Float], Seq[Double], Double)].collect()
    for ((v, r, s) <- rows; (orig, rec) <- v.zip(r))
      assert(math.abs(orig.toDouble - rec) <= s / 2 + 1e-12,
        s"component error ${math.abs(orig - rec)} > scale/2 = ${s / 2}")
  }

  test("knnInt8 matches exact knn on a well-separated corpus") {
    // directions far enough apart that int8 error cannot flip the order
    val corpus = Seq(
      (0L, "q", Seq(1.0f, 0.0f, 0.0f)),
      (1L, "a", Seq(0.9f, 0.1f, 0.0f)),
      (2L, "b", Seq(0.5f, 0.5f, 0.0f)),
      (3L, "c", Seq(0.0f, 1.0f, 0.0f)),
      (4L, "d", Seq(-1.0f, 0.0f, 0.1f))).toDF("vec_id", "label", "embedding")
    val query = corpus.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val got = Similarity.knnInt8(corpus, "vec_id", "embedding", query, 3)
      .select("vec_id").as[Long].collect().toSeq
    val exact = Similarity.bruteForceKnn(corpus, "vec_id", "embedding", query, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === exact)
    assert(got === Seq(0L, 1L, 2L))
  }

  test("knnInt8 plans scan + TakeOrdered, no shuffle of the corpus") {
    val corpus = Seq.tabulate(20)(i =>
      (i.toLong, "x", Seq(i.toFloat, 1.0f))).toDF("vec_id", "label", "embedding")
    val query = corpus.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val plan = Similarity.knnInt8(corpus, "vec_id", "embedding", query, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }
}
