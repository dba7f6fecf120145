package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Pure-JVM PDF text extraction (SURVEY §2 S10 / X4).
  *
  * The reference shells out to `pdftotext` to turn a lab-report PDF
  * into lines for the RIN state-machine scan
  * (register-cel-dropbox.py:49-80 `parseMetadata`). The binary is not
  * in this environment, and at 100 TB a per-file subprocess is the
  * wrong shape anyway — this is the executor-side byte walk (same
  * posture as [[Dicom]]'s PS3.10 parser): find the content streams,
  * inflate FlateDecode ones (java.util.zip — the only codec simple
  * text PDFs use), and interpret the text-showing operators.
  *
  * Scope, stated honestly: text-op extraction for SIMPLE TEXT PDFs —
  * literal `(…)` strings with the full escape set (octal included),
  * hex `<…>` strings, `Tj`/`TJ`/`'`/`"` shows, layout-naive line
  * breaks on `Td`/`TD`/`T*`/`ET`. That is exactly the class the
  * reference feeds pdftotext (machine-generated lab reports); CID
  * fonts, encodings beyond Latin-1, and positioned layout are out of
  * scope and route through the [[graft.exec.External]] seam as before.
  * The writer side ([[render]]) emits a valid single-page PDF 1.4 with
  * a Flate-compressed content stream, so the whole byte path —
  * compress → xref → parse → inflate → operator walk — round-trips
  * under the q_pdf gate without any vendor tool.
  */
object Pdf {

  // ------------------------------------------------------------- writer

  private def escString(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case c    => c.toString
    }

  /** Render `lines` as a one-page PDF (Helvetica 10pt, one text line
    * per Td row, Flate-compressed content stream, correct xref).
    * Deterministic bytes for fixture rendering and dedup of rendered
    * documents. */
  def render(lines: Seq[String], compress: Boolean = true): Array[Byte] = {
    val shows = lines.zipWithIndex.map { case (l, i) =>
      (if (i == 0) "" else "0 -14 Td ") + s"(${escString(l)}) Tj"
    }.mkString(" ")
    val content = s"BT /F1 10 Tf 50 742 Td $shows ET"
    val raw = content.getBytes("ISO-8859-1")
    val data =
      if (!compress) raw
      else {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        val out = new java.io.ByteArrayOutputStream()
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.toByteArray
      }
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
      s"<< /Length ${data.length}$filter >>", // stream object, body appended below
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (body, i) =>
      val off = out.size()
      w(s"${i + 1} 0 obj\n$body\n")
      if (i == 3) { w("stream\n"); out.write(data); w("\nendstream\n") }
      w("endobj\n")
      off
    }
    val xref = out.size()
    w(s"xref\n0 ${objs.size + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${objs.size + 1} /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------- reader

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsDictionary() &&
      !(inf.needsInput() && inf.getRemaining == 0)) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) return out.toByteArray // truncated
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** The text-op interpreter over one DECODED content stream. */
  private[sources] def textOps(s: String): String = {
    val out = new StringBuilder
    val line = new StringBuilder
    val pending = new StringBuilder
    // a line exists once ANY show op ran on it — `() Tj` is an empty
    // line, not no line (caught by PdfProps round-trip)
    var lineStarted = false
    def flushLine(): Unit =
      if (lineStarted || line.nonEmpty) {
        out.append(line).append('\n'); line.setLength(0); lineStarted = false
      }
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case '(' => // literal string with nesting + escapes
          i += 1
          var depth = 1
          while (i < n && depth > 0) {
            s.charAt(i) match {
              case '\\' =>
                i += 1
                if (i < n) {
                  s.charAt(i) match {
                    case 'n' => pending.append('\n')
                    case 'r' => pending.append('\r')
                    case 't' => pending.append('\t')
                    case 'b' => pending.append('\b')
                    case 'f' => pending.append('\f')
                    case d if d >= '0' && d <= '7' =>
                      var oct = d - '0'
                      var j = 0
                      while (j < 2 && i + 1 < n && s.charAt(i + 1) >= '0' &&
                        s.charAt(i + 1) <= '7') {
                        i += 1; oct = oct * 8 + (s.charAt(i) - '0'); j += 1
                      }
                      pending.append(oct.toChar)
                    case '\n' => () // line continuation
                    case other => pending.append(other)
                  }
                  i += 1
                }
              case '(' => depth += 1; pending.append('('); i += 1
              case ')' =>
                depth -= 1; if (depth > 0) pending.append(')'); i += 1
              case c => pending.append(c); i += 1
            }
          }
        case '<' if i + 1 < n && s.charAt(i + 1) != '<' => // hex string
          i += 1
          val hex = new StringBuilder
          while (i < n && s.charAt(i) != '>') {
            val c = s.charAt(i)
            if (Character.digit(c, 16) >= 0) hex.append(c)
            i += 1
          }
          i += 1
          if (hex.length % 2 == 1) hex.append('0') // PDF pads odd hex
          hex.toString.grouped(2)
            .foreach(h => pending.append(Integer.parseInt(h, 16).toChar))
        case '<' => i += 2 // '<<' dict open (inline images only) — skip
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < n && { val ch = s.charAt(i)
            ch.isLetterOrDigit || ch == '\'' || ch == '"' || ch == '*' }) i += 1
          s.substring(start, i) match {
            case "Tj" | "TJ" =>
              line.append(pending); pending.setLength(0); lineStarted = true
            case "'" | "\"" => // move-to-next-line-and-show
              flushLine(); line.append(pending); pending.setLength(0)
              lineStarted = true
            case "Td" | "TD" | "T*" => flushLine()
            case "ET" => flushLine()
            case _ => () // other operators: operands already consumed/ignored
          }
        case _ => i += 1 // numbers, delimiters, whitespace, /names' slash
      }
    }
    flushLine()
    out.toString
  }

  /** Extract the text of every content stream in `bytes`. Stream
    * boundaries come from the object's own /Length when it is a direct
    * integer (our writer and most simple PDFs), falling back to the
    * next `endstream` keyword; /FlateDecode streams are inflated. */
  def extractText(bytes: Array[Byte]): String = {
    val s = new String(bytes, "ISO-8859-1")
    val out = new StringBuilder
    var from = 0
    while ({ val k = s.indexOf("stream", from); k >= 0 && {
      val isEnd = k >= 3 && s.regionMatches(k - 3, "end", 0, 3)
      if (isEnd) { from = k + 6; true }
      else {
        // dict = text between the enclosing 'obj' and 'stream'
        val objStart = math.max(0, s.lastIndexOf("obj", k))
        val dict = s.substring(objStart, k)
        var dataStart = k + 6
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val lenRx = "/Length\\s+(\\d+)(?!\\s+0\\s+R)".r
        val dataEnd = lenRx.findFirstMatchIn(dict).map(_.group(1).toInt) match {
          case Some(len) if dataStart + len <= s.length => dataStart + len
          case _ =>
            val e = s.indexOf("endstream", dataStart)
            if (e < 0) s.length else e
        }
        val data = bytes.slice(dataStart, dataEnd)
        val decoded =
          if (dict.contains("/FlateDecode")) inflate(data) else data
        val text = textOps(new String(decoded, "ISO-8859-1"))
        if (text.nonEmpty) out.append(text)
        from = dataEnd
        true
      }
    }}) ()
    // single trailing newline policy: textOps already newline-terminates
    out.toString.stripSuffix("\n")
  }

  /** Column form — a UDF by necessity, like [[Dicom.dicomTags]]: a
    * stateful byte/operator walk no built-in expression family covers.
    * One call per FILE (payload-local, no shuffle), not per row of a
    * fact table. */
  def pdfText(payload: Column): Column = pdfTextUdf(payload)

  private lazy val pdfTextUdf = udf((b: Array[Byte]) =>
    if (b == null) null else extractText(b))
}
