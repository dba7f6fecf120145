package graft.sources

import graft.SparkSpec
import graft.reports.Reports
import org.apache.spark.sql.functions._

/** S13 + reports package, against a REAL JDBC database — embedded Derby
  * (in-memory), the same wire path `spark.read.jdbc` takes to a
  * production path-info DB. */
class JdbcReportsSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE data_set_files (
      data_set_code VARCHAR(32), relative_path VARCHAR(256),
      file_name VARCHAR(128), size_in_bytes BIGINT, last_modified VARCHAR(32))""")
    Seq(
      ("DS1", "original", "original", 0L, "2024-01-01"),
      ("DS1", "run1/reads.fastq", "reads.fastq", 100L, "2024-01-02"),
      ("DS1", "summary.txt", "summary.txt", 5L, "2024-01-03"),
      ("DS2", "a/b/c.raw", "c.raw", 7L, "2024-01-04"),
      ("DS3", "x.txt", "x.txt", 1L, "2024-01-05")
    ).foreach { case (c, p, f, s, m) =>
      st.execute(s"INSERT INTO data_set_files VALUES ('$c','$p','$f',$s,'$m')")
    }
    conn.close()
  }

  test("query-files report over a JDBC path-info DB, with pushdown") {
    seeded
    val files = Jdbc.readTable(spark, url, "data_set_files")
    val report = Reports.fileReport(files, Seq("DS1", "DS2"))
    val got = report
      .select("data_set_code", "relative_path", "folder")
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("DS1", "run1/reads.fastq", "run1"),
      ("DS1", "summary.txt", ""),
      ("DS2", "a/b/c.raw", "b"))) // "original" dropped, DS3 not requested
    // The code filter must reach the database, not run post-scan.
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("data_set_code"),
      s"expected data_set_code filter pushed into the JDBC scan:\n$plan")
  }

  test("property-tsv and parent-map reports") {
    val samples = Seq(
      ("QABCD001A0", Map("Q_EXTERNALDB_ID" -> "X1", "Q_SECONDARY_NAME" -> "s1",
        "Q_PROPERTIES" -> "<p/>")),
      ("QABCD002B4", Map("Q_SECONDARY_NAME" -> "s2")),
      ("QOTHR003C1", Map("Q_EXTERNALDB_ID" -> "nope"))
    ).toDF("code", "props")
    val tsv = Reports.propertyTsv(samples, "code", Seq("QABCD001A0", "QABCD002B4"))
      .as[(String, Option[String], Option[String], Option[String])].collect().toSet
    assert(tsv === Set(
      ("QABCD001A0", Some("X1"), Some("s1"), Some("<p/>")),
      ("QABCD002B4", None, Some("s2"), None)))
    val edges = Seq(("QABCD002B4", "/SPACE/QABCD001A0"), ("QX", "/S/QY"))
      .toDF("child", "parent")
    val pm = Reports.parentMap(edges, Seq("QABCD002B4"))
      .as[(String, String)].collect().toSet
    assert(pm === Set(("QABCD002B4", "QABCD001A0")))
  }

  test("readJson parses a whole-file JSON metadata document (S4)") {
    val d = java.nio.file.Files.createTempDirectory("graft-json")
    java.nio.file.Files.writeString(d.resolve("meta.json"),
      """{"type": "dna_seq", "sample1": {"id": "QABCD001A0", "genome": "GRCh38"}}""")
    val meta = Parsers.readJson(spark, d.toString)
    val row = meta.select(col("type"), col("sample1.id"), col("sample1.genome"))
      .as[(String, String, String)].collect().head
    assert(row === (("dna_seq", "QABCD001A0", "GRCh38")))
  }
}
