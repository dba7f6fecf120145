package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WfPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("name split + status upsert + two datasets per result") {
    val incoming = Seq(
      ("SPACE1_QABCD_QABCDE1_QABCD001A0", "wf/out1"),
      ("garbage", "wf/out2")
    ).toDF("name", "path")
    val parsed = WfPipeline.parseName(incoming, "name")
    assert(parsed.filter(size(col("__errors")) > 0).count() === 1)

    val samples = Seq(("QABCD001A0", Map("k" -> "v"))).toDF("code", "props")
    val updated = WfPipeline.updateStatus(samples,
      parsed.filter(size(col("__errors")) === 0), "FINISHED")
    val props = updated.filter(col("code") === "QABCD001A0")
      .select("props").as[Map[String, String]].collect().head
    assert(props === Map("k" -> "v", "wf_status" -> "FINISHED"))

    val ds = WfPipeline.resultDatasets(parsed)
    assert(ds.count() === 2)
    assert(rows(ds.select("dsType")).flatten.toSet === Set("WF_RESULT", "WF_LOG"))
  }
}

class AttachmentPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("sidecar pivots to one row; attachments decode and validate") {
    val sidecar = AttachmentPipeline.readSidecar(spark, fixture("metadata.txt"))
    assert(rows(sidecar) === Seq(Seq("QABCD001A0", "alice", "desc = with equals")))

    val files = Seq("report%20final.pdf").toDF("name")
    val attached = AttachmentPipeline.attach(files, sidecar)
    assert(rows(attached.select("decoded_name")).flatten === Seq("report final.pdf"))
    assert(attached.filter(size(col("__errors")) === 0).count() === 1)
  }

  test("invalid sidecar barcode is error-tagged, not thrown") {
    val bad = Seq(("barcode", "QABCD001A1")).toDF("key", "value")
      .groupBy().pivot("key", Seq("barcode", "user", "info")).agg(first(col("value")))
    val attached = AttachmentPipeline.attach(Seq("a.pdf").toDF("name"), bad)
    assert(attached.filter(size(col("__errors")) > 0).count() === 1)
  }

  test("two uploads in one batch each attach to their OWN sidecar barcode") {
    import graft.functions.Barcode
    // Two upload folders, each with its own metadata.txt.
    val base = java.nio.file.Files.createTempDirectory("graft-attach").toString
    val codes = Seq("QABCD001A0",
      rows(spark.range(1).select(
        Barcode.make(lit("QABCD"), lit(2), lit("A")))).head.head.toString)
    Seq("up1", "up2").zip(codes).foreach { case (folder, code) =>
      val d = java.nio.file.Paths.get(base, folder)
      java.nio.file.Files.createDirectory(d)
      java.nio.file.Files.writeString(d.resolve("metadata.txt"),
        s"barcode=$code\nuser=alice\ninfo=x\n")
    }
    val sidecars = AttachmentPipeline.readSidecars(spark, s"$base/*/metadata.txt")
    assert(sidecars.count() === 2)
    // The ingest's file scan derives the same folder URIs as the sidecar
    // scan; mirror that by folder suffix rather than hand-building URIs.
    val folders = rows(sidecars.select("folder")).flatten.map(_.toString)
    val files = Seq(("doc%20one.pdf", folders.find(_.endsWith("up1")).get),
      ("doc%20two.pdf", folders.find(_.endsWith("up2")).get))
      .toDF("name", "folder")
    val attached = AttachmentPipeline.attach(files, sidecars, Seq("folder"))
    assert(attached.filter(size(col("__errors")) > 0).count() === 0)
    val pairing = rows(attached.select("decoded_name", "barcode")
      .orderBy("decoded_name"))
    assert(pairing === Seq(Seq("doc one.pdf", codes(0)),
      Seq("doc two.pdf", codes(1))))
  }

  test("keyless attach REFUSES a multi-row sidecar batch") {
    val two = Seq(("barcode", "QABCD001A0"), ("barcode", "QABCD002AX"))
      .toDF("key", "value")
      .groupBy("value").pivot("key", Seq("barcode", "user", "info"))
      .agg(first(col("value"))).drop("value")
    val e = intercept[IllegalArgumentException] {
      AttachmentPipeline.attach(Seq("a.pdf").toDF("name"), two)
    }
    assert(e.getMessage.contains("ONE sidecar row"))
  }
}
