package graft.sources

import graft.SparkSpec
import graft.functions.MapOps
import graft.operators.Joins
import org.apache.spark.sql.functions._
import java.nio.file.{Files => JFiles, Paths}

class FilesSpec extends SparkSpec {

  private lazy val dropbox: String = {
    val d = JFiles.createTempDirectory("graft-dropbox")
    JFiles.writeString(d.resolve("upload1.fastq"), "ACGT")
    JFiles.writeString(d.resolve(".MARKER_is_finished_upload1.fastq"), "")
    JFiles.writeString(d.resolve("incomplete.fastq"), "ACGT")
    JFiles.createDirectory(d.resolve("run2"))
    JFiles.writeString(d.resolve("run2/reads.fastq"), "ACGT")
    JFiles.writeString(d.resolve(".MARKER_is_finished_run2"), "")
    d.toString
  }

  test("binaryScan enumerates data files with metadata, recursively") {
    val df = Files.binaryScan(spark, dropbox)
    assert(df.columns.toSet === Set("path", "modificationTime", "length", "content"))
    assert(df.count() === 3) // dot-prefixed markers are hidden from scans
  }

  test("listMarkers sees the dot-prefixed markers scans cannot") {
    val m = Files.listMarkers(spark, dropbox)
    assert(m.count() === 2)
  }

  test("markerGated keeps marker-complete uploads only") {
    val kept = Files.markerGated(
        Files.binaryScan(spark, dropbox), Files.listMarkers(spark, dropbox))
      .select("path").collect().map(_.getString(0)).toSet
    assert(kept.exists(_.endsWith("upload1.fastq")))
    assert(kept.exists(_.endsWith("run2/reads.fastq")))
    assert(!kept.exists(_.endsWith("incomplete.fastq")))
    assert(!kept.exists(_.contains("MARKER")))
  }

  test("pathSegments derives structure columns from the run tree") {
    val df = Files.pathSegments(
      Files.binaryScan(spark, dropbox, glob = "*.fastq"), dropbox,
      Seq("entry", "member"))
    val run2 = df.filter(col("entry") === "run2")
    assert(rows(run2.select("member")).flatten === Seq("reads.fastq"))
  }
}

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("whitelist keeps panel members only") {
    val df = Seq("BRAF", "KRAS", "XYZ").toDF("gene")
    val panel = Seq("BRAF", "KRAS", "EGFR").toDF("gene")
    assert(rows(Joins.whitelist(df, panel, Seq("gene"))).flatten.toSet ===
      Set("BRAF", "KRAS"))
  }

  test("absent emits members with no occurrence") {
    val all = Seq("BRAF", "EGFR").toDF("gene")
    val seen = Seq("BRAF").toDF("gene")
    assert(rows(Joins.absent(all, seen, Seq("gene"))).flatten === Seq("EGFR"))
  }

  test("lookup flags misses instead of dropping them") {
    val df = Seq("QA", "QB").toDF("code")
    val dim = Seq(("QA", "/SPACE/P1")).toDF("code", "ident")
    val r = Joins.lookup(df, dim, Seq("code"))
    val m = r.select("code", "__miss").as[(String, Boolean)].collect().toMap
    assert(m === Map("QA" -> false, "QB" -> true))
  }

  test("lookup does not false-positive a legitimately-NULL payload as a miss") {
    val df = Seq("QA", "QB").toDF("code")
    val dim = Seq(("QA", null: String)).toDF("code", "ident") // hit, NULL payload
    val r = Joins.lookup(df, dim, Seq("code"))
    val m = r.select("code", "__miss").as[(String, Boolean)].collect().toMap
    assert(m === Map("QA" -> false, "QB" -> true))
    assert(!r.columns.contains("__hit")) // sentinel does not leak
  }

  test("joinOnPath normalizes ./ and double slashes") {
    val meta = Seq("./data//f1.raw").toDF("fname")
    val files = Seq("data/f1.raw").toDF("path")
    assert(Joins.joinOnPath(meta, files, "fname", "path").count() === 1)
  }
}

class MapOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dropKeys + dropPlaceholders + lowerKeys compose") {
    val df = Seq("A=1\nSECRET=x\nB=*\nC= v ").toDF("txt")
      .select(str_to_map(col("txt"), lit("\n"), lit("=")).as("m"))
      .select(MapOps.trimValues(MapOps.lowerKeys(
        MapOps.dropPlaceholders(MapOps.dropKeys(col("m"), Seq("SECRET"))))).as("m"))
    val m = df.as[Map[String, String]].collect().head
    assert(m === Map("a" -> "1", "c" -> "v"))
  }
}

class RetrySpec extends SparkSpec {
  import graft.exec.External

  test("withRetry retries then succeeds; exhausts then throws") {
    var calls = 0
    val r = External.withRetry(attempts = 3, backoffMs = 1) {
      calls += 1
      if (calls < 3) sys.error("transient") else "ok"
    }
    assert(r === "ok" && calls === 3)
    intercept[RuntimeException] {
      External.withRetry(attempts = 2, backoffMs = 1)(sys.error("always"))
    }
  }
}
