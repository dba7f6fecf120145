package graft.plans

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class RewriteDotProductSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("portable aggregate(zip_with) dot rewrites to the native kernel") {
    val df = emb.select(
      Similarity.dotPortable(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_dot"),
      s"expected array_dot in optimized plan:\n$optimized")
  }

  test("rewrite preserves values bit-for-bit") {
    val portableOnly = emb.select(col("vec_id"),
      Similarity.dot(col("embedding"), col("embedding")).as("d"))
    val viaRewrite = emb.select(col("vec_id"),
      Similarity.dotPortable(col("embedding"), col("embedding")).as("d"))
    assert(rows(portableOnly.orderBy("vec_id")) === rows(viaRewrite.orderBy("vec_id")))
  }

  test("kernel NULL semantics match the portable fold on ragged/null arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),       // ragged
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null elem
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0))   // clean
    ).toDF("a", "b")
    val both = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotPortable(col("a"), col("b")).as("portable"))
    assert(rows(both) === Seq(Seq(null, null), Seq(null, null), Seq(11.0, 11.0)))
  }

  test("mixed float/double pair rewrites via an inserted exact widening cast") {
    // float vector × double literal plane — the SRP-banding hot path.
    val planes = Similarity.hyperplanes(1, 64)
    val mixed = Similarity.dotPortable(col("embedding"), typedLit(planes.head))
    val df = emb.select(mixed.as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_dot"),
      s"expected array_dot for mixed float/double pair:\n$optimized")
    // Bit-identical to the unrewritten fold: compare against the same HOF
    // on a pre-cast double column (which the rule leaves in kernel form
    // too, but through the double/double path — the anchor is the explicit
    // per-element cast semantics).
    val viaDouble = emb.select(col("vec_id"), Similarity.dotPortable(
      col("embedding").cast("array<double>"), typedLit(planes.head)).as("d"))
    val viaMixed = emb.select(col("vec_id"), mixed.as("d"))
    assert(rows(viaDouble.orderBy("vec_id")) === rows(viaMixed.orderBy("vec_id")))
  }
}
