package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the PDF byte path — pure JVM (no Spark session),
  * so hundreds of random documents are cheap. The writer must produce
  * bytes the extractor returns VERBATIM for arbitrary printable lines
  * (including every escape-relevant character), compressed or not. */
object PdfProps extends Properties("Pdf") {

  // printable ASCII lines, biased toward the characters the PDF string
  // syntax treats specially: ( ) \ < > [ ]
  private val line: Gen[String] = for {
    n <- Gen.choose(0, 40)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(32.toChar, 126.toChar),
      1 -> Gen.oneOf('(', ')', '\\', '<', '>', '[', ']')))
  } yield cs.mkString

  private val doc: Gen[List[String]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, line))

  property("render → extractText round-trips arbitrary lines (Flate)") =
    Prop.forAll(doc) { lines =>
      Pdf.extractText(Pdf.render(lines)) == lines.mkString("\n")
    }

  property("render → extractText round-trips uncompressed too") =
    Prop.forAll(doc) { lines =>
      Pdf.extractText(Pdf.render(lines, compress = false)) ==
        lines.mkString("\n")
    }

  property("rendered bytes are deterministic") =
    Prop.forAll(doc) { lines =>
      java.util.Arrays.equals(Pdf.render(lines), Pdf.render(lines))
    }
}
