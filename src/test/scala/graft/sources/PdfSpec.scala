package graft.sources

import graft.SparkSpec

/** Pure-JVM PDF writer + text extractor (register-cel-dropbox.py's
  * pdftotext seam, S10/X4): byte-level round trips and the text-op
  * interpreter's corner cases. The end-to-end path over real files
  * crosses the q_pdf gate. */
class PdfSpec extends SparkSpec {

  test("render → extractText round-trips lines (FlateDecode)") {
    val lines = Seq("Auftragsnummer", "I42R007a03", "RIN Nummer",
      "QABCD123A0", "7,3")
    val bytes = Pdf.render(lines)
    assert(new String(bytes.take(8), "ISO-8859-1").startsWith("%PDF-1.4"))
    assert(Pdf.extractText(bytes) == lines.mkString("\n"))
  }

  test("uncompressed content stream round-trips too") {
    val lines = Seq("line one", "line two")
    val bytes = Pdf.render(lines, compress = false)
    assert(new String(bytes, "ISO-8859-1").contains("BT /F1 10 Tf"))
    assert(Pdf.extractText(bytes) == "line one\nline two")
  }

  test("writer escapes parens and backslashes; reader unescapes") {
    val lines = Seq("a(b)c", "d\\e", "f(g(h))i")
    assert(Pdf.extractText(Pdf.render(lines)) == lines.mkString("\n"))
  }

  test("textOps: escapes, octal, nesting") {
    val t = Pdf.textOps("""BT (a\(b\)c) Tj 0 -14 Td (d\\e) Tj 0 -14 Td (\101\102C) Tj ET""")
    assert(t == "a(b)c\nd\\e\nABC\n")
  }

  test("textOps: balanced nested parens need no escape") {
    assert(Pdf.textOps("BT (a(b)c) Tj ET") == "a(b)c\n")
  }

  test("textOps: hex strings, odd-length padding") {
    assert(Pdf.textOps("BT <48656C6C6F> Tj ET") == "Hello\n")
    assert(Pdf.textOps("BT <486> Tj ET") == "H`\n") // odd hex pads with 0
  }

  test("textOps: TJ arrays concat strings, ignore kerning numbers") {
    assert(Pdf.textOps("BT [(He) -120 (llo)] TJ ET") == "Hello\n")
  }

  test("textOps: quote operators imply a line break before showing") {
    assert(Pdf.textOps("BT (a) Tj (b) ' ET") == "a\nb\n")
  }

  test("extractText: /Length boundary wins over embedded 'endstream' text") {
    // a RAW stream whose text mentions endstream — /Length must bound it
    val content = "BT (has endstream inside) Tj ET"
    val pdf = s"""%PDF-1.4
                 |4 0 obj
                 |<< /Length ${content.length} >>
                 |stream
                 |$content
                 |endstream
                 |endobj
                 |%%EOF
                 |""".stripMargin
    assert(Pdf.extractText(pdf.getBytes("ISO-8859-1")) == "has endstream inside")
  }

  test("pdfText column form handles null payloads") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Option(Pdf.render(Seq("x"))), None).toDF("content")
      .select(Pdf.pdfText(col("content")).as("t"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "x")
    assert(rows(1).isNullAt(0))
  }
}
