package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Synthetic-fixture tests for the pure-JVM DICOM parser: files are
  * built byte-by-byte here (PS3.10 layout), never read from disk, so
  * the suite is hermetic and the expected values are self-evident. */
class DicomSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- fixture byte builders
  private def pad(s: String, padByte: Byte = ' '): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.US_ASCII)
    if (b.length % 2 == 0) b else b :+ padByte
  }

  /** Explicit VR LE element (short form for string VRs). */
  private def exEl(group: Int, elem: Int, vr: String, value: String): Array[Byte] = {
    val v = pad(value, if (vr == "UI") 0x00 else ' ')
    val buf = ByteBuffer.allocate(8 + v.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(group.toShort).putShort(elem.toShort)
      .put(vr.getBytes(StandardCharsets.US_ASCII))
      .putShort(v.length.toShort).put(v)
    buf.array()
  }

  /** Implicit VR LE element. */
  private def imEl(group: Int, elem: Int, value: String): Array[Byte] = {
    val v = pad(value)
    val buf = ByteBuffer.allocate(8 + v.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(group.toShort).putShort(elem.toShort)
      .putInt(v.length).put(v)
    buf.array()
  }

  /** Explicit VR LE undefined-length SQ with one raw item, delimited. */
  private def exSqUndefined(group: Int, elem: Int, itemBytes: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(12 + 8 + itemBytes.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(group.toShort).putShort(elem.toShort)
      .put("SQ".getBytes(StandardCharsets.US_ASCII)).putShort(0.toShort)
      .putInt(0xFFFFFFFF)                          // undefined length
    buf.putShort(0xFFFE.toShort).putShort(0xE000.toShort) // item
      .putInt(itemBytes.length).put(itemBytes)
    buf.putShort(0xFFFE.toShort).putShort(0xE0DD.toShort) // seq delimiter
      .putInt(0)
    buf.array()
  }

  private def file(transferSyntax: String, body: Array[Byte]*): Array[Byte] = {
    val meta = exEl(0x0002, 0x0010, "UI", transferSyntax)
    val out = new java.io.ByteArrayOutputStream()
    out.write(new Array[Byte](128))
    out.write("DICM".getBytes(StandardCharsets.US_ASCII))
    out.write(meta)
    body.foreach(out.write)
    out.toByteArray
  }

  private val ExplicitLE = "1.2.840.10008.1.2.1"
  private val ImplicitLE = "1.2.840.10008.1.2"

  private def explicitFixture: Array[Byte] = file(ExplicitLE,
    exEl(0x0008, 0x0020, "DA", "20200102"),      // StudyDate (anon set)
    exEl(0x0008, 0x0060, "CS", "MR"),            // Modality (kept)
    // item content uses the dataset transfer syntax (explicit here)
    exSqUndefined(0x0008, 0x1110, exEl(0x0008, 0x1150, "UI", "1.2.3.4")),
    exEl(0x0010, 0x0010, "PN", "DOE^JOHN"),      // PatientsName (anon set)
    exEl(0x0010, 0x1010, "AS", "045Y"),          // PatientsAge (anon set)
    exEl(0x0018, 0x1030, "LO", "HeadProtocol"))  // ProtocolName (anon set)

  /** Undefined-length SQ whose single UNDEFINED-length item nests another
    * undefined-length SQ — the shape a raw delimiter scan truncates at
    * the INNER (FFFE,E0DD). */
  private def exSqNested(group: Int, elem: Int): Array[Byte] = {
    val inner = exSqUndefined(0x0008, 0x9215, exEl(0x0008, 0x0100, "SH", "C1"))
    val buf = ByteBuffer.allocate(12 + 8 + inner.length + 8 + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(group.toShort).putShort(elem.toShort)
      .put("SQ".getBytes(StandardCharsets.US_ASCII)).putShort(0.toShort)
      .putInt(0xFFFFFFFF)                           // outer SQ: undefined
    buf.putShort(0xFFFE.toShort).putShort(0xE000.toShort)
      .putInt(0xFFFFFFFF)                           // item: undefined
    buf.put(inner)                                  // nested undefined SQ
    buf.putShort(0xFFFE.toShort).putShort(0xE00D.toShort).putInt(0) // item delim
    buf.putShort(0xFFFE.toShort).putShort(0xE0DD.toShort).putInt(0) // seq delim
    buf.array()
  }

  // ---------------------------------------------------------------- parse
  test("explicit VR walk returns every top-level tag with rendered values") {
    val els = Dicom.elements(explicitFixture)
    val byTag = els.map(e => ((e.group, e.element), e)).toMap
    assert(byTag((0x0008, 0x0020)).value === Some("20200102"))
    assert(byTag((0x0008, 0x0060)).value === Some("MR"))
    assert(byTag((0x0010, 0x0010)).value === Some("DOE^JOHN"))
    assert(byTag((0x0010, 0x1010)).value === Some("045Y"))
    assert(byTag((0x0018, 0x1030)).value === Some("HeadProtocol"))
    // the SQ is walked structurally, not descended into
    assert(byTag((0x0008, 0x1110)).vr === "SQ")
    assert(!byTag.contains((0x0008, 0x1150)))
    // file-meta transfer syntax is an ordinary element
    assert(byTag((0x0002, 0x0010)).value === Some(ExplicitLE))
  }

  test("nested undefined-length sequences are walked structurally, not scanned") {
    // elements AFTER the nested SQ must still parse correctly — a raw
    // byte scan for (FFFE,E0DD) stops at the INNER delimiter and
    // misaligns everything that follows
    val f = file(ExplicitLE,
      exEl(0x0008, 0x0060, "CS", "MR"),
      exSqNested(0x0008, 0x1115),
      exEl(0x0010, 0x0010, "PN", "AFTER^NEST"))
    val byTag = Dicom.elements(f).map(e => ((e.group, e.element), e)).toMap
    assert(byTag((0x0008, 0x1115)).vr === "SQ")
    assert(byTag((0x0010, 0x0010)).value === Some("AFTER^NEST"))
    // anonymize must survive the same structure byte-exactly outside PII
    val anon = Dicom.elements(Dicom.anonymize(f, "anon"))
      .map(e => ((e.group, e.element), e)).toMap
    assert(anon((0x0010, 0x0010)).value === Some("anon"))
    assert(anon((0x0008, 0x0060)).value === Some("MR"))
  }

  test("implicit VR dataset parses via the transfer-syntax switch") {
    val f = file(ImplicitLE,
      imEl(0x0010, 0x0010, "ROE^JANE"),
      imEl(0x0010, 0x0040, "F"))
    val byTag = Dicom.elements(f).map(e => ((e.group, e.element), e)).toMap
    assert(byTag((0x0010, 0x0010)).value === Some("ROE^JANE"))
    assert(byTag((0x0010, 0x0040)).value === Some("F"))
    assert(!byTag((0x0010, 0x0010)).explicitForm)
  }

  test("unsupported transfer syntax is rejected loudly") {
    val f = file("1.2.840.10008.1.2.2", exEl(0x0010, 0x0040, "CS", "F"))
    val ex = intercept[IllegalArgumentException] { Dicom.elements(f) }
    assert(ex.getMessage.contains("transfer syntax"))
  }

  test("keyword dictionary covers the reference anonymization set") {
    assert(Dicom.AnonymizationTags.size === 51) // HCC_dicom_anonymize.py:28-43
    assert(Dicom.keyword(0x0010, 0x0010) === Some("PatientsName"))
    assert(Dicom.keyword(0x0008, 0x0060) === None) // Modality not in set
  }

  // ------------------------------------------------------------ anonymize
  test("anonymize blanks the field set, renames the patient, keeps the rest") {
    val anon = Dicom.anonymize(explicitFixture, patientName = "anonymous")
    val byTag = Dicom.elements(anon).map(e => ((e.group, e.element), e)).toMap
    assert(byTag((0x0010, 0x0010)).value === Some("anonymous"))
    assert(byTag((0x0008, 0x0020)).value === Some(""))
    assert(byTag((0x0010, 0x1010)).value === Some(""))
    assert(byTag((0x0018, 0x1030)).value === Some(""))
    // non-PII content byte-identical
    assert(byTag((0x0008, 0x0060)).value === Some("MR"))
    assert(byTag((0x0008, 0x1110)).vr === "SQ")
    // still a valid stream: re-anonymizing is a no-op
    assert(Dicom.anonymize(anon, "anonymous").toSeq === anon.toSeq)
  }

  test("anonymize descends into sequence items: nested person-name is blanked") {
    // PatientsName (PN, anon set) hidden INSIDE a non-anon-set sequence
    // item — PS3.5 §7.5 descent; a top-level-only rewrite leaks it
    val f = file(ExplicitLE,
      exEl(0x0008, 0x0060, "CS", "MR"),
      exSqUndefined(0x0040, 0x0275, // RequestAttributesSequence (kept)
        exEl(0x0010, 0x0010, "PN", "HIDDEN^NAME") ++
          exEl(0x0008, 0x0050, "SH", "ACC123") ++   // AccessionNumber (anon set)
          exEl(0x0008, 0x0060, "CS", "CT")),        // kept verbatim
      exEl(0x0010, 0x0010, "PN", "TOP^LEVEL"))
    val anon = Dicom.anonymize(f, "anon")
    assert(!new String(anon, StandardCharsets.ISO_8859_1).contains("HIDDEN"))
    assert(!new String(anon, StandardCharsets.ISO_8859_1).contains("ACC123"))
    assert(new String(anon, StandardCharsets.ISO_8859_1).contains("CT"))
    // the rewritten stream is still structurally valid
    val byTag = Dicom.elements(anon).map(e => ((e.group, e.element), e)).toMap
    assert(byTag((0x0010, 0x0010)).value === Some("anon"))
    assert(byTag((0x0040, 0x0275)).vr === "SQ")
    // defined-length item was re-encoded: re-anonymizing is a no-op
    assert(Dicom.anonymize(anon, "anon").toSeq === anon.toSeq)
  }

  test("anonymization-set sequence tags are emptied outright") {
    // ReferringPhysicianIDSequence (0008,0096) is IN the anon set: the
    // reference sets the attribute to '' — the whole item stream goes
    val f = file(ExplicitLE,
      exSqUndefined(0x0008, 0x0096, exEl(0x0008, 0x0100, "SH", "DRWHO")),
      exEl(0x0008, 0x0060, "CS", "MR"))
    val anon = Dicom.anonymize(f, "anon")
    assert(!new String(anon, StandardCharsets.ISO_8859_1).contains("DRWHO"))
    val byTag = Dicom.elements(anon).map(e => ((e.group, e.element), e)).toMap
    assert(byTag((0x0008, 0x0096)).valueLength === 0)
    assert(byTag((0x0008, 0x0060)).value === Some("MR"))
  }

  test("declared length past the buffer fails loudly instead of hanging") {
    // a 32-bit length in [2^31, 0xFFFFFFFE] turned negative under .toInt
    // in older walks and moved the cursor BACKWARDS — infinite loop, not
    // an error (advice r7). All three walks must throw.
    def withLen(raw: Long): Array[Byte] = {
      val el = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      el.putShort(0x0008.toShort).putShort(0x0008.toShort)
        .put("UN".getBytes(StandardCharsets.US_ASCII)).putShort(0.toShort)
        .putInt((raw & 0xFFFFFFFFL).toInt)
      file(ExplicitLE, el.array())
    }
    for (bad <- Seq(0xFFFFFFF8L, 0x80000000L, 1000000L)) {
      val ex = intercept[IllegalArgumentException] { Dicom.elements(withLen(bad)) }
      assert(ex.getMessage.contains("truncated"))
      intercept[IllegalArgumentException] { Dicom.anonymize(withLen(bad)) }
    }
    // same guard inside a sequence item header
    val seqBuf = ByteBuffer.allocate(12 + 8).order(ByteOrder.LITTLE_ENDIAN)
    seqBuf.putShort(0x0008.toShort).putShort(0x1110.toShort)
      .put("SQ".getBytes(StandardCharsets.US_ASCII)).putShort(0.toShort)
      .putInt(0xFFFFFFFF)
    seqBuf.putShort(0xFFFE.toShort).putShort(0xE000.toShort)
      .putInt(0x80000004)                        // item length ≥ 2^31
    val ex2 = intercept[IllegalArgumentException] {
      Dicom.elements(file(ExplicitLE, seqBuf.array()))
    }
    assert(ex2.getMessage.contains("truncated"))
  }

  test("non-ASCII patient name pads to even BYTE length (PS3.5 §6.2)") {
    // "Ä" is 1 char / 2 UTF-8 bytes: char-count padding would append a
    // space and emit an odd 3-byte value
    val f = file(ExplicitLE, exEl(0x0010, 0x0010, "PN", "DOE^JOHN"))
    val anon = Dicom.anonymize(f, "Ä")
    val e = Dicom.elements(anon).find(x => x.group == 0x0010 && x.element == 0x0010).get
    assert(e.valueLength % 2 === 0)
    assert(e.valueLength === 2)
    // and a 3-byte ASCII name still pads with one space to 4
    val anon2 = Dicom.anonymize(f, "px7")
    val e2 = Dicom.elements(anon2).find(x => x.group == 0x0010 && x.element == 0x0010).get
    assert(e2.valueLength === 4)
    assert(e2.value === Some("px7"))
  }

  /** Implicit VR LE element whose value is raw bytes (sequence bodies). */
  private def imElRaw(group: Int, elem: Int, value: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + value.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(group.toShort).putShort(elem.toShort)
      .putInt(value.length).put(value)
    buf.array()
  }

  /** One defined-length (FFFE,E000) item wrapping `content`. */
  private def imItem(content: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + content.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.putShort(0xFFFE.toShort).putShort(0xE000.toShort)
      .putInt(content.length).put(content)
    buf.array()
  }

  test("implicit-VR DEFINED-length sequences are structure-sniffed and descended") {
    // no VR and no undefined length to give the sequence away — only the
    // well-formed item stream filling the value exactly; a top-level-only
    // (or undefined-length-only) rewrite leaks the nested person name
    val item = imItem(imEl(0x0010, 0x0010, "HIDDEN^IMP") ++ imEl(0x0008, 0x0060, "CT"))
    val f = file(ImplicitLE,
      imElRaw(0x0040, 0x0275, item),      // RequestAttributesSequence (kept)
      imEl(0x0010, 0x0010, "TOP^NAME"))
    val anon = Dicom.anonymize(f, "anon")
    val s = new String(anon, StandardCharsets.ISO_8859_1)
    assert(!s.contains("HIDDEN"))
    assert(s.contains("CT"))
    assert(Dicom.anonymize(anon, "anon").toSeq === anon.toSeq) // idempotent
    // anon-set sequence tag in the same encoding is emptied outright
    val f2 = file(ImplicitLE,
      imElRaw(0x0008, 0x0096, imItem(imEl(0x0008, 0x0100, "DRWHO"))),
      imEl(0x0008, 0x0060, "MR"))
    val anon2 = new String(Dicom.anonymize(f2, "anon"), StandardCharsets.ISO_8859_1)
    assert(!anon2.contains("DRWHO"))
    assert(anon2.contains("MR"))
  }

  test("binary that FRAMES like an item but has non-element content stays verbatim") {
    // frames as one well-formed 8-byte item, but the content is garbage:
    // parsed as an implicit element header it declares undefined length,
    // which would crash the descent's structural walk — the sniff must
    // validate CONTENT, not just framing, and fall back to verbatim
    val fakeUndef = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0xFFFE.toShort).putShort(0xE000.toShort).putInt(8)
      b.putInt(0xFFFFFFFF).putInt(0xFFFFFFFF) // 8 content bytes of 0xFF
      b.array()
    }
    // frames as one 4-byte item: too short to be an element run — a
    // framing-only sniff would descend and silently DROP the 4 bytes
    val fakeShort = {
      val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0xFFFE.toShort).putShort(0xE000.toShort).putInt(4)
      b.putInt(0xCAFEBABE)
      b.array()
    }
    for (fake <- Seq(fakeUndef, fakeShort)) {
      val f = file(ImplicitLE,
        imElRaw(0x7FE0, 0x0010, fake),
        imEl(0x0008, 0x0060, "US"))
      val anon = Dicom.anonymize(f, "anon") // must not throw
      val els = Dicom.elements(anon).map(e => ((e.group, e.element), e)).toMap
      val e = els((0x7FE0, 0x0010))
      assert(anon.slice(e.valueOffset, e.valueOffset + e.valueLength).toSeq
        === fake.toSeq)
    }
  }

  test("item-tag-looking binary that fails stream validation stays verbatim") {
    // starts with (FFFE,E000) but its declared item length overruns the
    // value — NOT a sequence; the sniff must reject it and the bytes
    // must survive untouched (a false positive would corrupt pixel data)
    val fake = {
      val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0xFFFE.toShort).putShort(0xE000.toShort)
        .putInt(9999).putInt(0xCAFEBABE)
      b.array()
    }
    val f = file(ImplicitLE,
      imElRaw(0x7FE0, 0x0010, fake),      // PixelData-ish payload
      imEl(0x0008, 0x0060, "US"))
    val anon = Dicom.anonymize(f, "anon")
    val els = Dicom.elements(anon).map(e => ((e.group, e.element), e)).toMap
    val e = els((0x7FE0, 0x0010))
    assert(anon.slice(e.valueOffset, e.valueOffset + e.valueLength).toSeq
      === fake.toSeq)
  }

  test("anonymize works on implicit VR files too") {
    val f = file(ImplicitLE,
      imEl(0x0010, 0x0010, "ROE^JANE"),
      imEl(0x0008, 0x0060, "CT"))
    val byTag = Dicom.elements(Dicom.anonymize(f, "px7"))
      .map(e => ((e.group, e.element), e)).toMap
    assert(byTag((0x0010, 0x0010)).value === Some("px7")) // padded to 4, stripped
    assert(byTag((0x0008, 0x0060)).value === Some("CT"))
  }

  // ----------------------------------------------------------- Spark seam
  test("dicomTags column decode: real (tag, keyword, value) rows in Spark") {
    val df = Seq((1L, explicitFixture)).toDF("id", "payload")
      .select(col("id"), explode(Dicom.dicomTags(col("payload"))).as("t"))
      .select("id", "t.group", "t.element", "t.keyword", "t.value")
      .filter(col("t.keyword").isNotNull)
    val got = rows(df).map(r => (r(3), r(4))).toSet
    assert(got === Set(("StudyDate", "20200102"), ("PatientsName", "DOE^JOHN"),
      ("PatientsAge", "045Y"), ("ProtocolName", "HeadProtocol")))
  }

  test("dicomAnonymize column rewrite round-trips through the parser") {
    val out = Seq((1L, explicitFixture)).toDF("id", "payload")
      .select(Dicom.dicomAnonymize(col("payload"), "anonymous").as("clean"))
      .select(explode(Dicom.dicomTags(col("clean"))).as("t"))
      .filter(col("t.keyword") === "PatientsName")
      .select("t.value")
    assert(rows(out) === Seq(Seq("anonymous")))
  }
}
