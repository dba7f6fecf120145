package graft.pipelines

import graft.SparkSpec
import graft.functions.Barcode
import graft.plans.ChecksumUtil
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Pure-JVM model of getNextFreeBarcode's counter→code formula
  * (register-mtb-data-dropbox.py:262-274), shared by the Spark spec and
  * the ScalaCheck properties. */
object BarcodeModel {
  def nth(project: String, n: Int): String = {
    val code = project + f"${n % 999}%03d" + ('A' + n / 999).toChar
    code + ChecksumUtil.compute(UTF8String.fromString(code)).toString
  }
}

class MtbPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("nthBarcode matches the model, rolls the letter at 999, no collisions") {
    val got = spark.range(1, 3001)
      .select(col("id"), MtbPipeline.nthBarcode(lit("QABCD"), col("id")).as("b"))
      .as[(Long, String)].collect()
    got.foreach { case (n, b) => assert(b === BarcodeModel.nth("QABCD", n.toInt)) }
    assert(got.map(_._2).distinct.length === 3000)
    val byN = got.toMap
    assert(byN(998L).startsWith("QABCD998A"))
    assert(byN(999L).startsWith("QABCD000B")) // Py2 999/999=1 → letter B
    assert(byN(1000L).startsWith("QABCD001B"))
    // Every generated barcode carries a valid checksum (engine-checked).
    val nValid = spark.range(1, 3001)
      .select(MtbPipeline.nthBarcode(lit("QABCD"), col("id")).as("b"))
      .filter(Barcode.isValid(col("b"))).count()
    assert(nValid === 3000)
  }

  test("nextFreeBarcodes skips existing codes in counter order") {
    // Existing store: counters 1,2,4 taken (3 free), plus an alien code.
    val existing = Seq(1, 2, 4).map(BarcodeModel.nth("QABCD", _))
      .appended("QXXXX001A0").toDF("code")
    val free = MtbPipeline.nextFreeBarcodes(existing, "QABCD", 0L, 3)
      .as[(String, Long)].collect()
    assert(free.map(_._2).toSeq === Seq(3L, 5L, 6L))
    assert(free.map(_._1).toSeq === Seq(3, 5, 6).map(BarcodeModel.nth("QABCD", _)))
  }

  test("pbmcTestSamples walks, filters by property, and guards 0/>1 hits") {
    // p1: one PBMC child with two grandchildren (happy path)
    // p2: two PBMC descendants (MANY_PBMC)
    // p3: no PBMC anywhere (PBMC_NOT_FOUND)
    val edges = Seq(
      ("b1", "p1"), ("t1a", "b1"), ("t1b", "b1"),
      ("b2", "p2"), ("b3", "p2"), ("t2", "b2"),
      ("b4", "p3")).toDF("child", "parent")
    val props = Seq(("b1", "PBMC"), ("b2", "PBMC"), ("b3", "PBMC"),
      ("b4", "TUMOR"), ("t1a", "TUMOR")).toDF("node", "tissue")
    val out = MtbPipeline.pbmcTestSamples(
        edges, props, Seq("p1", "p2", "p3").toDF("node"), "tissue")
      .select(col("start"), col("pbmc"), col("test_sample"), col("n_pbmc"),
        array_join(col("__errors"), ",").as("errs"))
      .as[(String, Option[String], Option[String], Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("p1") === ((Some("b1"), Some("t1a"), 1L, "")))
    assert(out("p2")._4 === "MANY_PBMC" && out("p2")._3 === 2L)
    assert(out("p3") === ((None, None, 0L, "PBMC_NOT_FOUND")))
  }
}

object BarcodeProps extends Properties("MtbBarcode") {
  private val counter: Gen[Int] = Gen.choose(1, 26 * 999 - 1)
  private val project: Gen[String] =
    Gen.listOfN(4, Gen.alphaUpperChar).map("Q" + _.mkString)

  property("always 10 chars with a valid reference checksum") =
    Prop.forAll(project, counter) { (p, n) =>
      val b = BarcodeModel.nth(p, n)
      b.length == 10 &&
        ChecksumUtil.compute(UTF8String.fromString(b.take(9))).toString == b.substring(9)
    }

  property("injective: distinct counters never collide") =
    Prop.forAll(project, counter, counter) { (p, a, b) =>
      (a == b) == (BarcodeModel.nth(p, a) == BarcodeModel.nth(p, b))
    }

  property("letter rolls exactly at multiples of 999") =
    Prop.forAll(counter) { n =>
      val b = BarcodeModel.nth("QABCD", n)
      b(8) == ('A' + n / 999).toChar && b.substring(5, 8) == f"${n % 999}%03d"
    }
}
