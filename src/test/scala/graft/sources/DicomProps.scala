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
}
