package graft.operators

import graft.SparkSpec
import graft.core.Errors
import graft.sources.Sinks
import graft.streaming.Ingest
import org.apache.spark.sql.functions._

class AlignSpec extends SparkSpec {
  import spark.implicits._

  test("alignSorted pairs rows positionally under each side's order") {
    val xls = Seq("b.xls", "a.xls").toDF("xls")
    val vcf = Seq("2.vcf", "1.vcf").toDF("vcf")
    val r = Align.alignSorted(xls, vcf, col("xls"), col("vcf"))
      .as[(String, String)].collect().toSet
    assert(r === Set(("a.xls", "1.vcf"), ("b.xls", "2.vcf")))
  }

  test("pairByStem groups raw+mzML by shared stem and flags completeness") {
    val files = Seq("run1.raw", "run1.mzML", "run2.raw").toDF("path")
    val r = Align.pairByStem(files, "path")
    val run1 = r.filter(col("stem") === "run1")
    assert(rows(run1.select("complete")).flatten === Seq(true))
    assert(rows(run1.select("paths")).map(_.head) === Seq(Seq("run1.mzML", "run1.raw")))
    assert(rows(r.filter(col("stem") === "run2").select("complete")).flatten === Seq(false))
  }

  test("latest picks the maximal row") {
    val df = Seq("v1.0", "v1.2", "v1.1").toDF("folder")
    assert(rows(Align.latest(df, col("folder"))).flatten === Seq("v1.2"))
  }
}

class ErrorsSpec extends SparkSpec {
  import spark.implicits._

  test("tag accumulates codes; split routes rows") {
    val df = Seq(("QX", 1), ("QY", 2), ("QZ", 3)).toDF("code", "n")
    val tagged = Errors.tag(
      Errors.tag(df, col("n") > 1, Errors.ChecksumMismatch),
      col("n") > 2, Errors.SampleNotFound)
    val (ok, err) = Errors.split(tagged)
    assert(rows(ok.select("code")).flatten === Seq("QX"))
    val errs = err.select("code", "__errors").as[(String, Seq[String])].collect().toMap
    assert(errs("QY") === Seq(Errors.ChecksumMismatch))
    assert(errs("QZ") === Seq(Errors.ChecksumMismatch, Errors.SampleNotFound))
  }
}

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("TSV export round-trips through the TSV reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tsv").toString + "/out"
    val df = Seq(("QABCD001A0", 7L)).toDF("Barcode", "Count")
    Sinks.writeTsv(df, dir, singleFile = true)
    val back = graft.sources.Parsers.readTsv(spark, dir)
    assert(back.columns.toSeq === Seq("Barcode", "Count"))
    assert(rows(back) === Seq(Seq("QABCD001A0", "7")))
  }

  test("xmlElement renders escaped attributes and body") {
    val df = Seq(("a<b", "x&y")).toDF("attr", "body")
      .select(Sinks.xmlElement("note", Seq("id" -> col("attr")), col("body")).as("x"))
    assert(rows(df).flatten === Seq("""<note id="a&lt;b">x&amp;y</note>"""))
  }

  /** Scala model of edit-note.py:17-31, the ground truth for appendNote. */
  private def modelAppend(xml: String, c: String, t: String, u: String): String = {
    val base = Option(xml)
      .map(_.split("\n", -1).filterNot(_.contains("</notes>")).mkString(""))
      .getOrElse("<notes>")
    base + s"\n<note>\n<comment>$c</comment>\n<time>$t</time>\n<username>$u</username>\n</note>\n</notes>"
  }

  test("appendNote: n sequential appends reproduce the reference plugin byte-for-byte") {
    val notes = Seq(("first note", "2024-01-01", "alice"),
      ("second", "2024-02-02", "bob"), ("third", "2024-03-03", "carol"))
    // Fold through the engine expression, one append per step (each step
    // reads the previous property value, as the plugin does)…
    val viaEngine = notes.foldLeft(null: String) { case (xml, (c, t, u)) =>
      Seq(Option(xml)).toDF("xml")
        .select(Sinks.appendNote(col("xml"), lit(c), lit(t), lit(u)).as("x"))
        .as[String].collect().head
    }
    // …and through the Jython model.
    val viaModel = notes.foldLeft(null: String) { case (xml, (c, t, u)) =>
      modelAppend(xml, c, t, u)
    }
    assert(viaEngine === viaModel)
    // Well-formed shape: starts/ends with the notes envelope, n note blocks
    // whose fields replay the inputs in append order.
    assert(viaEngine.startsWith("<notes>") && viaEngine.endsWith("</notes>"))
    val cs = "<comment>(.*?)</comment>".r.findAllMatchIn(viaEngine).map(_.group(1)).toSeq
    assert(cs === notes.map(_._1))
  }
}

class IngestExactlyOnceSpec extends SparkSpec {

  test("re-running the checkpointed ingest does not duplicate rows") {
    val base = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val dest = s"$base/dest"
    val ckpt = s"$base/ckpt"
    val src = "/root/testdata/sf0.001"
    val n1 = Ingest.ingestExactlyOnce(spark, src, "region.parquet", dest, ckpt)
    val n2 = Ingest.ingestExactlyOnce(spark, src, "region.parquet", dest, ckpt)
    val direct = spark.read.parquet(s"$src/region.parquet").count()
    assert(n1 === direct)
    assert(n2 === direct) // second run is a no-op, not an append
  }
}
