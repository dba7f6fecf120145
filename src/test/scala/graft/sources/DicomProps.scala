package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the DICOM byte walk — pure JVM (no Spark session),
  * so hundreds of random files are cheap. render → elements must
  * round-trip every element, and anonymize must be idempotent and
  * non-PII-preserving on arbitrary inputs. */
object DicomProps extends Properties("Dicom") {

  // printable ASCII without trailing pad characters (the parser strips
  // trailing space/NUL per PS3.5, so values ending in them cannot
  // round-trip byte-for-byte by design)
  private val value: Gen[String] = for {
    n <- Gen.choose(0, 16)
    cs <- Gen.listOfN(n, Gen.choose(33.toChar, 126.toChar))
  } yield cs.mkString

  private val stringVr: Gen[String] =
    Gen.oneOf("AE", "AS", "CS", "DA", "LO", "PN", "SH", "ST", "TM")

  private val element: Gen[(Int, Int, String, String)] = for {
    g <- Gen.oneOf(0x0008, 0x0010, 0x0018, 0x0020, 0x0038)
    e <- Gen.choose(1, 0x2000)
    vr <- stringVr
    v <- value
  } yield (g, e, vr, v)

  // distinct tags per file: repeated tags are legal DICOM but make the
  // by-tag comparison ambiguous
  private val file: Gen[List[(Int, Int, String, String)]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, element))
      .map(_.distinctBy(x => (x._1, x._2)))

  property("render → elements round-trips every element") =
    Prop.forAll(file) { els =>
      val parsed = Dicom.elements(Dicom.render(els))
        .filterNot(e => e.group == 0x0002)
        .map(e => (e.group, e.element, e.vr, e.value.getOrElse("")))
      parsed == els.map { case (g, e, vr, v) => (g, e, vr, v) }
    }

  property("anonymize is idempotent") =
    Prop.forAll(file) { els =>
      val once = Dicom.anonymize(Dicom.render(els), "anon")
      Dicom.anonymize(once, "anon").toSeq == once.toSeq
    }

  property("anonymize blanks every dictionary tag, keeps every other") =
    Prop.forAll(file) { els =>
      val parsed = Dicom.elements(Dicom.anonymize(Dicom.render(els), "anon"))
        .filterNot(e => e.group == 0x0002)
        .map(e => (e.group, e.element) -> e.value.getOrElse("")).toMap
      els.forall { case (g, e, _, v) =>
        Dicom.keyword(g, e) match {
          case Some("PatientsName") => parsed((g, e)) == "anon"
          case Some(_) => parsed((g, e)) == ""
          case None => parsed((g, e)) == v
        }
      }
    }

  // ------------------------------------------------ sequence descent props
  // Hand-built explicit-VR bytes (render() is deliberately top-level-only):
  // a defined-length item inside an undefined-length SQ, holding random
  // elements with UNIQUE sentinel values, so presence/absence in the
  // anonymized byte stream is unambiguous.
  import java.nio.{ByteBuffer, ByteOrder}
  import java.nio.charset.StandardCharsets

  private def exEl(g: Int, e: Int, vr: String, v: String): Array[Byte] = {
    val raw = v.getBytes(StandardCharsets.US_ASCII)
    val vb = if (raw.length % 2 == 0) raw else raw :+ ' '.toByte
    val b = ByteBuffer.allocate(8 + vb.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(g.toShort).putShort(e.toShort)
      .put(vr.getBytes(StandardCharsets.US_ASCII))
      .putShort(vb.length.toShort).put(vb)
    b.array()
  }

  private def exSq(g: Int, e: Int, item: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(12 + 8 + item.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(g.toShort).putShort(e.toShort)
      .put("SQ".getBytes(StandardCharsets.US_ASCII)).putShort(0.toShort)
      .putInt(0xFFFFFFFF)
    b.putShort(0xFFFE.toShort).putShort(0xE000.toShort)
      .putInt(item.length).put(item)
    b.putShort(0xFFFE.toShort).putShort(0xE0DD.toShort).putInt(0)
    b.array()
  }

  private def explicitFile(body: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(new Array[Byte](128))
    out.write("DICM".getBytes(StandardCharsets.US_ASCII))
    out.write(exEl(0x0002, 0x0010, "UI", "1.2.840.10008.1.2.1"))
    body.foreach(out.write)
    out.toByteArray
  }

  // sentinel values are unique per position and ≥ 8 chars, so a plain
  // byte-scan cannot confuse one value for a fragment of another
  private val nestedFile: Gen[(Array[Byte], List[(Int, Int, String)])] = for {
    n <- Gen.choose(1, 6)
    raw <- Gen.listOfN(n, element)
  } yield {
    val els = raw.distinctBy(x => (x._1, x._2)).zipWithIndex
      .map { case ((g, e, vr, _), i) => (g, e, vr, f"sentinel$i%04dv") }
    val item = els.flatMap { case (g, e, vr, v) => exEl(g, e, vr, v) }.toArray
    val f = explicitFile(
      exEl(0x0008, 0x0060, "CS", "MR"),
      exSq(0x0040, 0x0275, item), // RequestAttributesSequence: NOT in dict
      exEl(0x0010, 0x0010, "PN", "TOP^NAME"))
    (f, els.map { case (g, e, _, v) => (g, e, v) })
  }

  property("descent blanks dictionary tags inside items, keeps the rest") =
    Prop.forAll(nestedFile) { case (f, nested) =>
      val anon = new String(Dicom.anonymize(f, "anon"), StandardCharsets.ISO_8859_1)
      nested.forall { case (g, e, v) =>
        if (Dicom.keyword(g, e).isDefined) !anon.contains(v) else anon.contains(v)
      } && !anon.contains("TOP^NAME")
    }

  property("anonymize stays idempotent and parseable with nested sequences") =
    Prop.forAll(nestedFile) { case (f, _) =>
      val once = Dicom.anonymize(f, "anon")
      val stable = Dicom.anonymize(once, "anon").toSeq == once.toSeq
      val tags = Dicom.elements(once).map(e => (e.group, e.element))
      stable && tags.contains((0x0040, 0x0275)) && tags.contains((0x0010, 0x0010))
    }
}
