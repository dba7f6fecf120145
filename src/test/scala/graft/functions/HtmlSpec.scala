package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h").select(stripHtml(col("h"))).head().getString(0)

  private def links(html: String): Seq[String] =
    Seq(html).toDF("h").select(extractLinks(col("h"))).head().getSeq[String](0)

  test("script and style subtrees vanish content and all; comments too") {
    val h = "<p>keep</p><script type=\"x\">var dropped = 1;</script>" +
      "<style>p{dropped}</style><!-- dropped --><p>also</p>"
    assert(strip(h) === "keep also")
  }

  test("multi-line (DOTALL) script bodies and cased tags are removed") {
    val h = "<SCRIPT>\nline1();\nline2();\n</SCRIPT><B>bold</B>"
    assert(strip(h) === "bold")
  }

  test("entities decode exactly once, &amp; last") {
    assert(strip("a &amp; b") === "a & b")
    assert(strip("&amp;lt; stays encoded") === "&lt; stays encoded")
    assert(strip("&lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y")
      === "<tag> \"q\" 's' x y")
  }

  test("whitespace collapses to single spaces, trimmed") {
    assert(strip("<div>\n  a\t\tb  \n</div>") === "a b")
  }

  test("extractLinks: cased HREF, spacing, document order; composes with canonicalizeUrl") {
    val h = "<a HREF=\"HTTP://Ex.com:80/p?utm_source=x&id=2\">x</a>" +
      "<a href = \"https://ex.org/a\">y</a><img src=\"no.png\"/>"
    assert(links(h) === Seq("HTTP://Ex.com:80/p?utm_source=x&id=2", "https://ex.org/a"))
    val canon = Seq(h).toDF("h")
      .select(transform(extractLinks(col("h")), canonicalizeUrl(_)).as("c"))
      .head().getSeq[String](0)
    assert(canon === Seq("http://ex.com/p?id=2", "https://ex.org/a"))
  }

  test("stripHtml is a no-op on plain text") {
    assert(strip("plain words only") === "plain words only")
  }

  private def anchors(html: String): Seq[(String, String)] =
    Seq(html).toDF("h").select(explode(extractAnchors(col("h"))).as("a"))
      .select("a.href", "a.text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("extractAnchors pairs each href with ITS OWN inner text") {
    val h = "<a href=\"http://one\">first</a> filler " +
      "<a class=\"z\" HREF=\"http://two\"><b>sec</b> ond</a>"
    assert(anchors(h) === Seq("http://one" -> "first", "http://two" -> "sec ond"))
  }

  test("extractAnchors decodes entities and collapses whitespace in text") {
    val h = "<a href=\"u\">read a &amp; b\n  now</a>"
    assert(anchors(h) === Seq("u" -> "read a & b now"))
  }

  test("anchors without href, and non-anchor tags, are ignored") {
    val h = "<a name=\"x\">no href</a><img src=\"i.png\"/><a href=\"u\">ok</a>"
    assert(anchors(h) === Seq("u" -> "ok"))
  }
}
