package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // lexical arm ranks docs 1,2,3; semantic arm ranks 2,3,4
  private def lex = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L))
    .toDF("qid", "id", "rank")
  private def sem = Seq((0L, 2L, 1L), (0L, 3L, 2L), (0L, 4L, 3L))
    .toDF("qid", "id", "rank")

  test("doc present in both arms outranks single-arm docs") {
    val r = Retrieval.rrfFuse(lex, sem, 60, 10).orderBy("rank")
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getDouble(3)))
    // doc 2: 1/62 + 1/61; doc 3: 1/63 + 1/62 — both beat any single arm
    assert(r.map(_._1).take(2).toSeq == Seq(2L, 3L))
    assert(math.abs(r(0)._3 - (1.0 / 62 + 1.0 / 61)) < 1e-12)
    // single-arm docs score exactly one reciprocal term
    val doc1 = r.find(_._1 == 1L).get
    assert(doc1._3 == 1.0 / 61, "missing arm must contribute exactly 0")
  }

  test("per-query isolation and topK bound") {
    val lex2 = lex.union(Seq((1L, 9L, 1L)).toDF("qid", "id", "rank"))
    val r = Retrieval.rrfFuse(lex2, sem, 60, 2)
    assert(r.filter(col("qid") === 1).count() == 1)
    assert(r.filter(col("qid") === 0).count() == 2, "topK must bound each query")
  }

  test("fusion composes with real arms: bm25TopN + bruteForceKnn shapes") {
    // bm25TopN emits (id, score); bruteForceKnn emits rows with sim —
    // the contract is only (qid, id, rank), so adapt both with a window
    val lexArm = Seq((7L, 10L, 5.0), (7L, 11L, 3.0)).toDF("qid", "id", "s")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("s").desc, col("id"))).cast("long"))
      .select("qid", "id", "rank")
    val semArm = Seq((7L, 11L, 0.9)).toDF("qid", "id", "s")
      .withColumn("rank", lit(1L)).select("qid", "id", "rank")
    val top = Retrieval.rrfFuse(lexArm, semArm, 60, 10)
      .orderBy("rank").collect()
    assert(top.head.getLong(1) == 11L, "two-arm doc 11 must fuse above doc 10")
  }
}
