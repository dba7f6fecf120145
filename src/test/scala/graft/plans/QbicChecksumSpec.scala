package graft.plans

import graft.{GraftExtensions, SparkSpec}
import graft.functions.Barcode
import org.apache.spark.sql.functions._

class QbicChecksumSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("native expression agrees with the pure-column formulation") {
    val rnd = new scala.util.Random(42)
    val codes = Seq.fill(500) {
      val proj = Seq.fill(4)(('A' + rnd.nextInt(26)).toChar).mkString
      f"Q$proj${rnd.nextInt(1000)}%03d${('A' + rnd.nextInt(26)).toChar}"
    }
    val df = codes.toDF("code").select(
      call_function("qbic_checksum", col("code")).as("native"),
      Barcode.checksumCharColumnar(col("code")).as("columnar"))
    assert(df.filter(col("native") =!= col("columnar")).count() === 0)
  }

  test("callable from SQL and stays inside whole-stage codegen") {
    Seq("QABCD001A").toDF("code").createOrReplaceTempView("codes_tmp")
    val df = spark.sql("SELECT qbic_checksum(code) AS c FROM codes_tmp")
    assert(rows(df).flatten === Seq("0"))
    // A file-backed scan (local relations constant-fold): the projection
    // containing the expression must sit inside a WholeStageCodegen span.
    val scan = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(call_function("qbic_checksum", col("c_name")).as("c"))
    scan.collect() // forces codegen compilation — would fall back on error
    // '*(n)' prefixes mark whole-stage-codegen'd operators in the plan dump.
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[qbic_checksum.*"))
  }

  test("null input yields null, wrong type fails analysis") {
    val df = Seq[Option[String]](None).toDF("code")
      .select(call_function("qbic_checksum", col("code")).as("c"))
    assert(rows(df).flatten === Seq(null))
    intercept[Exception] {
      Seq(1).toDF("n").select(call_function("qbic_checksum", col("n"))).collect()
    }
  }
}
