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

  test("mixed element types are NOT rewritten (would read wrong bytes)") {
    // float vector × double literal plane — must stay a HOF fold.
    val planes = Similarity.hyperplanes(1, 64)
    val df = emb.select(
      Similarity.dotPortable(col("embedding"), typedLit(planes.head)).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("array_dot"))
    assert(df.count() > 0) // and it still evaluates
  }
}
