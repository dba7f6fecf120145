package graft.plans

import graft.{GraftExtensions, SparkSpec}
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def nfc(c: org.apache.spark.sql.Column) =
    call_function("nfc_normalize", c)

  test("decomposed sequences compose; composed and ASCII pass through") {
    val decomposedE = "é"       // e + combining acute
    val composedE = "é"          // é
    val df = Seq(decomposedE, composedE, "plain ascii", "Å")
      .toDF("s")
      .select(col("s"), nfc(col("s")).as("n"))
    val got = rows(df.select(col("n"), length(col("n")).as("len")))
    assert(got === Seq(
      Seq(composedE, 1),
      Seq(composedE, 1),
      Seq("plain ascii", 11),
      Seq("Å", 1)))
  }

  test("interpreted eval agrees with codegen on a file-backed scan") {
    // local relations constant-fold (interpreted eval); a parquet scan
    // goes through whole-stage codegen — both paths call NfcUtil.
    val interp = Seq("résumé").toDF("s")
      .select(nfc(col("s"))).collect()(0).getString(0)
    val scan = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .select(nfc(concat(lit("résumé "), col("n_name"))).as("n"))
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[nfc_normalize.*"),
      s"expected nfc_normalize inside a WholeStageCodegen span:\n$plan")
    assert(interp === "résumé")
    assert(rows(scan.limit(1)).flatten.head.toString.startsWith("résumé "))
  }

  test("null in, null out; non-string argument fails analysis") {
    val df = Seq[Option[String]](None).toDF("s").select(nfc(col("s")).as("n"))
    assert(rows(df) === Seq(Seq(null)))
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(nfc(col("x"))).collect()
    }
    assert(err.getMessage.contains("string"))
  }
}
