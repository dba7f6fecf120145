package graft.pipelines

import graft.SparkSpec
import graft.sources.Files
import org.apache.spark.sql.functions._
import java.nio.file.{Files => JFiles}

class HlaPipelineSpec extends SparkSpec {
  import spark.implicits._

  // A dropbox with one class-I result (A* alleles), one class-II result
  // (DQB1-only), and a decoy file the router must ignore.
  private lazy val dropbox: String = {
    val d = JFiles.createTempDirectory("graft-hla")
    JFiles.createDirectory(d.resolve("QABCD001A0_typing"))
    JFiles.writeString(d.resolve("QABCD001A0_typing/result.alleles"),
      "A*01:01\nA*02:01\nB*07:02\n")
    JFiles.createDirectory(d.resolve("QABCD002B4_typing"))
    JFiles.writeString(d.resolve("QABCD002B4_typing/alleles.txt"),
      "DQB1*02:01\nDQB1*03:01\n")
    JFiles.writeString(d.resolve("README.md"), "A* not a result file")
    d.toString
  }

  test("routes MHC class by whole-file content and names samples HLA<s><parent>") {
    val out = HlaPipeline.hlaSamples(Files.binaryScan(spark, dropbox))
      .select("sample_code", "parent", "hla_class", "typing")
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set("HLA1QABCD001A0", "HLA2QABCD002B4"))
    assert(out("HLA1QABCD001A0") ===
      (("QABCD001A0", "MHC_CLASS_I", "A*01:01\nA*02:01\nB*07:02\n")))
    assert(out("HLA2QABCD002B4") ===
      (("QABCD002B4", "MHC_CLASS_II", "DQB1*02:01\nDQB1*03:01\n")))
  }

  test("register: two result files for one parent pick a deterministic winner") {
    // a re-upload scenario: result.alleles AND alleles.txt for the SAME
    // parent in one batch → same sample_code twice; the reference's
    // sequential loop keeps an order-dependent winner, register pins the
    // lexicographically greatest path ('result.alleles' > 'alleles.txt')
    val d = JFiles.createTempDirectory("graft-hla-dup")
    JFiles.createDirectory(d.resolve("QABCD009X9_typing"))
    JFiles.writeString(d.resolve("QABCD009X9_typing/alleles.txt"),
      "A*11:11\n")
    JFiles.writeString(d.resolve("QABCD009X9_typing/result.alleles"),
      "A*22:22\n")
    val existing = Seq.empty[(String, String, String, String)]
      .toDF("sample_code", "parent", "hla_class", "typing")
    (1 to 3).foreach { _ =>
      val merged = HlaPipeline.register(existing, Files.binaryScan(spark, d.toString))
        .select("sample_code", "typing").as[(String, String)].collect()
      assert(merged.toSeq === Seq(("HLA1QABCD009X9", "A*22:22\n")))
    }
  }

  test("register upserts: creates new samples, re-types existing ones") {
    val existing = Seq(
      ("HLA1QABCD001A0", "QABCD001A0", "MHC_CLASS_I", "A*99:99 stale"),
      ("HLA2QZZZZ003C1", "QZZZZ003C1", "MHC_CLASS_II", "untouched"))
      .toDF("sample_code", "parent", "hla_class", "typing")
    val merged = HlaPipeline.register(existing, Files.binaryScan(spark, dropbox))
      .select("sample_code", "typing").as[(String, String)].collect().toMap
    assert(merged.keySet ===
      Set("HLA1QABCD001A0", "HLA2QABCD002B4", "HLA2QZZZZ003C1"))
    assert(merged("HLA1QABCD001A0").startsWith("A*01:01")) // refreshed
    assert(merged("HLA2QZZZZ003C1") === "untouched")       // survives
  }
}
