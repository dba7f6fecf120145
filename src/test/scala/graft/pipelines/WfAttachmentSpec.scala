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
}
