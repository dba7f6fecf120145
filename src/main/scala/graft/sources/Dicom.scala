package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Minimal pure-JVM DICOM (PS3.10) tag parser — the real decode behind
  * SURVEY §2.1 S11, scoped to what the reference's anonymizer needs
  * (`HCC_dicom_anonymize.py:28-43`: read the ~50 de-identification
  * attributes, blank them, keep everything else). DICOM is a public
  * standard; no codec library is involved because the anonymization
  * field set is entirely string-VR header data — pixel decoding stays
  * out of scope (and out of this environment).
  *
  * Supported encodings: the File Meta group is always Explicit VR
  * Little Endian per the standard; the main dataset may be Explicit or
  * Implicit VR LE (transfer syntaxes 1.2.840.10008.1.2.1 /
  * 1.2.840.10008.1.2), chosen by (0002,0010) or, preamble-less, by
  * whether the first element carries a well-known VR code. Big-endian
  * and deflated syntaxes are rejected loudly. Sequences are walked
  * structurally (defined lengths skipped exactly; undefined lengths
  * scanned to their (FFFE,E0DD) delimiter) but not descended into —
  * the anonymization set is all top-level.
  */
object Dicom {
  /** One top-level data element. `value` is rendered only for string
    * VRs (trailing pad stripped). `headerOffset`/`valueOffset`/
    * `valueLength` address the raw bytes; `explicitForm` records which
    * encoding the element was parsed under (file-meta is always
    * explicit even in implicit files). */
  final case class Element(group: Int, element: Int, vr: String,
                           headerOffset: Int, valueOffset: Int,
                           valueLength: Int, explicitForm: Boolean,
                           value: Option[String])

  /** VRs using the 2-reserved-bytes + 4-byte-length long form in
    * Explicit VR encoding (PS3.5 §7.1.2). */
  private val LongFormVrs = Set("OB", "OW", "OF", "OL", "OD", "OV",
    "SQ", "UC", "UR", "UT", "UN")

  /** String-renderable VRs (character data, PS3.5 table 6.2-1). */
  private val StringVrs = Set("AE", "AS", "CS", "DA", "DS", "DT", "IS",
    "LO", "LT", "PN", "SH", "ST", "TM", "UI", "UC", "UR", "UT")

  private val OtherVrs = Set("FL", "FD", "SL", "SS", "UL", "US", "AT")

  /** The reference's ANONYMIZATION_FIELDS (`HCC_dicom_anonymize.py:28`),
    * keyword → (group, element) per the public DICOM data dictionary
    * (PS3.6). The reference addresses them by pydicom keyword; tags are
    * the stable identity. */
  val AnonymizationTags: Seq[(String, Int, Int)] = Seq(
    ("StudyDate", 0x0008, 0x0020), ("SeriesDate", 0x0008, 0x0021),
    ("AcquisitionDate", 0x0008, 0x0022), ("ContentDate", 0x0008, 0x0023),
    ("OverlayDate", 0x0008, 0x0024), ("CurveDate", 0x0008, 0x0025),
    ("AcquisitionDatetime", 0x0008, 0x002A), ("StudyTime", 0x0008, 0x0030),
    ("SeriesTime", 0x0008, 0x0031), ("AcquisitionTime", 0x0008, 0x0032),
    ("ContentTime", 0x0008, 0x0033), ("OverlayTime", 0x0008, 0x0034),
    ("CurveTime", 0x0008, 0x0035), ("AccessionNumber", 0x0008, 0x0050),
    ("InstitutionName", 0x0008, 0x0080), ("InstitutionAddress", 0x0008, 0x0081),
    ("ReferringPhysiciansName", 0x0008, 0x0090),
    ("ReferringPhysiciansAddress", 0x0008, 0x0092),
    ("ReferringPhysiciansTelephoneNumber", 0x0008, 0x0094),
    ("ReferringPhysicianIDSequence", 0x0008, 0x0096),
    ("InstitutionalDepartmentName", 0x0008, 0x1040),
    ("PhysicianOfRecord", 0x0008, 0x1048),
    ("PhysicianOfRecordIDSequence", 0x0008, 0x1049),
    ("PerformingPhysiciansName", 0x0008, 0x1050),
    ("PerformingPhysicianIDSequence", 0x0008, 0x1052),
    ("NameOfPhysicianReadingStudy", 0x0008, 0x1060),
    ("PhysicianReadingStudyIDSequence", 0x0008, 0x1062),
    ("OperatorsName", 0x0008, 0x1070),
    ("PatientsName", 0x0010, 0x0010), ("PatientID", 0x0010, 0x0020),
    ("IssuerOfPatientID", 0x0010, 0x0021),
    ("PatientsBirthDate", 0x0010, 0x0030),
    ("PatientsBirthTime", 0x0010, 0x0032), ("PatientsSex", 0x0010, 0x0040),
    ("OtherPatientIDs", 0x0010, 0x1000), ("OtherPatientNames", 0x0010, 0x1001),
    ("PatientsBirthName", 0x0010, 0x1005), ("PatientsAge", 0x0010, 0x1010),
    ("PatientsAddress", 0x0010, 0x1040),
    ("PatientsMothersBirthName", 0x0010, 0x1060),
    ("CountryOfResidence", 0x0010, 0x2150),
    ("RegionOfResidence", 0x0010, 0x2152),
    ("PatientsTelephoneNumbers", 0x0010, 0x2154),
    ("ProtocolName", 0x0018, 0x1030),
    ("StudyID", 0x0020, 0x0010),
    ("CurrentPatientLocation", 0x0038, 0x0300),
    ("PatientsInstitutionResidence", 0x0038, 0x0400),
    ("DateTime", 0x0040, 0xA120), ("Date", 0x0040, 0xA121),
    ("Time", 0x0040, 0xA122), ("PersonName", 0x0040, 0xA123))

  private val keywordByTag: Map[(Int, Int), String] =
    AnonymizationTags.map { case (k, g, e) => (g, e) -> k }.toMap

  /** Keyword for a tag if it is in the anonymization dictionary. */
  def keyword(group: Int, element: Int): Option[String] =
    keywordByTag.get((group, element))

  private val ExplicitLE = "1.2.840.10008.1.2.1"
  private val ImplicitLE = "1.2.840.10008.1.2"

  /** Parse all top-level elements (file-meta + main dataset). */
  def elements(bytes: Array[Byte]): Seq[Element] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[Element]
    val hasPreamble = bytes.length >= 132 &&
      bytes(128) == 'D' && bytes(129) == 'I' && bytes(130) == 'C' && bytes(131) == 'M'
    var pos = if (hasPreamble) 132 else 0
    var inMeta = hasPreamble
    var explicit = if (hasPreamble) true else looksExplicit(bytes, 0)
    var mainExplicit = explicit // until (0002,0010) says otherwise

    while (pos + 8 <= bytes.length) {
      val group = buf.getShort(pos) & 0xFFFF
      val element = buf.getShort(pos + 2) & 0xFFFF
      if (inMeta && group != 0x0002) { inMeta = false; explicit = mainExplicit }
      val useExplicit = if (inMeta) true else explicit
      var vr = "UN"
      var len = 0L
      var valOff = 0
      if (useExplicit) {
        vr = new String(bytes, pos + 4, 2, StandardCharsets.US_ASCII)
        if (LongFormVrs.contains(vr)) {
          len = buf.getInt(pos + 8) & 0xFFFFFFFFL; valOff = pos + 12
        } else {
          len = buf.getShort(pos + 6) & 0xFFFFL; valOff = pos + 8
        }
      } else {
        len = buf.getInt(pos + 4) & 0xFFFFFFFFL; valOff = pos + 8
      }
      if (len == 0xFFFFFFFFL) {
        // undefined length (sequences/encapsulation): STRUCTURAL walk of
        // the item stream to this sequence's own (FFFE,E0DD) delimiter —
        // a raw byte scan would stop at a NESTED sequence's delimiter,
        // or at value bytes that merely look like one, and misalign the
        // rest of the parse
        val end = skipSequenceContent(buf, bytes, valOff, useExplicit)
        out += Element(group, element, vr, pos, valOff, end - valOff,
          useExplicit, None)
        pos = end + 8 // delimiter item: tag(4) + zero length(4)
      } else {
        val l = len.toInt
        if (valOff + l > bytes.length)
          throw new IllegalArgumentException(
            f"truncated DICOM element ($group%04x,$element%04x) at $pos")
        val value =
          if (StringVrs.contains(vr) || (!useExplicit && isPrintable(bytes, valOff, l)))
            Some(renderString(bytes, valOff, l))
          else None
        out += Element(group, element, vr, pos, valOff, l, useExplicit, value)
        pos = valOff + l
        if (inMeta && group == 0x0002 && element == 0x0010) {
          renderString(bytes, valOff, l) match {
            case ExplicitLE => mainExplicit = true
            case ImplicitLE => mainExplicit = false
            case other => throw new IllegalArgumentException(
              s"unsupported DICOM transfer syntax: $other (only Explicit/" +
                "Implicit VR Little Endian)")
          }
        }
      }
    }
    out.result()
  }

  private def looksExplicit(bytes: Array[Byte], pos: Int): Boolean = {
    if (pos + 6 > bytes.length) return true
    val v = new String(bytes, pos + 4, 2, StandardCharsets.US_ASCII)
    StringVrs.contains(v) || LongFormVrs.contains(v) || OtherVrs.contains(v)
  }

  /** Walk an undefined-length SEQUENCE's item stream; returns the
    * position of this sequence's own (FFFE,E0DD) delimiter. Items with
    * defined length are skipped exactly; undefined-length items recurse
    * into [[skipItemContent]]. */
  private def skipSequenceContent(buf: ByteBuffer, bytes: Array[Byte],
                                  from: Int, explicit: Boolean): Int = {
    var p = from
    while (p + 8 <= bytes.length) {
      val g = buf.getShort(p) & 0xFFFF
      val e = buf.getShort(p + 2) & 0xFFFF
      if (g == 0xFFFE && e == 0xE0DD) return p
      if (g != 0xFFFE || e != 0xE000)
        throw new IllegalArgumentException(
          f"malformed DICOM sequence: expected item tag at $p, got ($g%04x,$e%04x)")
      val l = buf.getInt(p + 4) & 0xFFFFFFFFL
      p = if (l == 0xFFFFFFFFL) skipItemContent(buf, bytes, p + 8, explicit)
          else p + 8 + l.toInt
    }
    throw new IllegalArgumentException(
      "unterminated undefined-length DICOM sequence")
  }

  /** Walk an undefined-length ITEM's element stream; returns the
    * position just past its (FFFE,E00D) item delimiter. Nested
    * undefined-length sequences recurse into [[skipSequenceContent]]. */
  private def skipItemContent(buf: ByteBuffer, bytes: Array[Byte],
                              from: Int, explicit: Boolean): Int = {
    var p = from
    while (p + 8 <= bytes.length) {
      val g = buf.getShort(p) & 0xFFFF
      val e = buf.getShort(p + 2) & 0xFFFF
      if (g == 0xFFFE && e == 0xE00D) return p + 8
      // ordinary element header, same form rules as the top-level walk
      var l = 0L
      var valOff = 0
      if (explicit) {
        val vr = new String(bytes, p + 4, 2, StandardCharsets.US_ASCII)
        if (LongFormVrs.contains(vr)) {
          l = buf.getInt(p + 8) & 0xFFFFFFFFL; valOff = p + 12
        } else {
          l = buf.getShort(p + 6) & 0xFFFFL; valOff = p + 8
        }
      } else {
        l = buf.getInt(p + 4) & 0xFFFFFFFFL; valOff = p + 8
      }
      p = if (l == 0xFFFFFFFFL)
            skipSequenceContent(buf, bytes, valOff, explicit) + 8
          else valOff + l.toInt
    }
    throw new IllegalArgumentException(
      "unterminated undefined-length DICOM item")
  }

  private def isPrintable(bytes: Array[Byte], off: Int, len: Int): Boolean = {
    var i = 0
    while (i < len) {
      val b = bytes(off + i)
      if ((b < 0x20 || b > 0x7E) && b != 0x00 && b != 0x0A && b != 0x0D &&
        b != 0x1B) return false
      i += 1
    }
    len > 0
  }

  private def renderString(bytes: Array[Byte], off: Int, len: Int): String = {
    var end = off + len
    while (end > off && (bytes(end - 1) == 0x20 || bytes(end - 1) == 0x00))
      end -= 1
    new String(bytes, off, end - off, StandardCharsets.UTF_8)
  }

  /** The reference's `anonymize_dicom` as a byte rewrite: every
    * anonymization-set element with a rendered string value is replaced
    * by '' (PatientsName by `patientName`), lengths re-encoded, every
    * other byte preserved verbatim. Values are space-padded to even
    * length per PS3.5 §6.2. Stale (gggg,0000) group-length elements
    * outside file-meta are dropped (retired in the standard; a length
    * rewrite would invalidate them anyway). */
  def anonymize(bytes: Array[Byte], patientName: String = "anonymous"): Array[Byte] = {
    val els = elements(bytes)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    // same 4-byte magic check as elements() — testing only bytes(131)
    // would mistake a preamble-less stream with 'M' at offset 131 for a
    // preambled one and duplicate its first 132 bytes
    val hasPreamble = bytes.length >= 132 &&
      bytes(128) == 'D' && bytes(129) == 'I' && bytes(130) == 'C' && bytes(131) == 'M'
    if (hasPreamble) out.write(bytes, 0, 132)
    for (e <- els) {
      val anon = keywordByTag.contains((e.group, e.element)) && e.value.isDefined
      val dropGroupLen = e.element == 0x0000 && e.group != 0x0002
      if (dropGroupLen) { /* skip stale group length */ }
      else if (!anon) {
        // verbatim copy: header + value (covers undefined-length runs too,
        // whose delimiter sits in the 8 bytes after the value slice)
        val end = e.valueOffset + e.valueLength +
          (if (wasUndefinedLength(e, bytes)) 8 else 0)
        out.write(bytes, e.headerOffset, end - e.headerOffset)
      } else {
        val replacement =
          if (e.group == 0x0010 && e.element == 0x0010) patientName else ""
        val padded =
          if (replacement.length % 2 == 0) replacement else replacement + " "
        val vbytes = padded.getBytes(StandardCharsets.UTF_8)
        val lenFieldBytes = lengthFieldSize(e)
        out.write(bytes, e.headerOffset,
          (e.valueOffset - lenFieldBytes) - e.headerOffset)
        writeLength(out, lenFieldBytes, vbytes.length)
        out.write(vbytes)
      }
    }
    out.toByteArray
  }

  private def wasUndefinedLength(e: Element, bytes: Array[Byte]): Boolean = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val rawLen =
      if (!e.explicitForm) buf.getInt(e.headerOffset + 4)
      else if (e.valueOffset - e.headerOffset == 12) buf.getInt(e.headerOffset + 8)
      else buf.getShort(e.headerOffset + 6).toInt
    rawLen == -1 // 0xFFFFFFFF as signed int (2-byte form can't encode it)
  }

  private def lengthFieldSize(e: Element): Int =
    if (!e.explicitForm) 4
    else if (e.valueOffset - e.headerOffset == 12) 4
    else 2

  private def writeLength(out: java.io.ByteArrayOutputStream,
                          lenFieldBytes: Int, n: Int): Unit = {
    val b = ByteBuffer.allocate(lenFieldBytes).order(ByteOrder.LITTLE_ENDIAN)
    if (lenFieldBytes == 4) b.putInt(n) else b.putShort(n.toShort)
    out.write(b.array(), 0, lenFieldBytes)
  }

  /** Render an Explicit-VR-LE DICOM file (preamble + DICM + file-meta
    * transfer syntax + the given string elements) — the write direction,
    * used to produce fixtures and synthetic payloads. Short-form string
    * VRs only; values are padded to even length per PS3.5 §6.2 (UI with
    * NUL, others with space). */
  def render(els: Seq[(Int, Int, String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(new Array[Byte](128))
    out.write("DICM".getBytes(StandardCharsets.US_ASCII))
    def el(g: Int, e: Int, vr: String, v: String): Unit = {
      require(!LongFormVrs.contains(vr), s"render supports short-form VRs, got $vr")
      val raw = v.getBytes(StandardCharsets.US_ASCII)
      val vb = if (raw.length % 2 == 0) raw
        else raw :+ (if (vr == "UI") 0x00.toByte else ' '.toByte)
      val bb = ByteBuffer.allocate(8 + vb.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putShort(g.toShort).putShort(e.toShort)
        .put(vr.getBytes(StandardCharsets.US_ASCII))
        .putShort(vb.length.toShort).put(vb)
      out.write(bb.array(), 0, bb.capacity())
    }
    el(0x0002, 0x0010, "UI", ExplicitLE)
    els.foreach { case (g, e, vr, v) => el(g, e, vr, v) }
    out.toByteArray
  }

  // --------------------------------------------------------- Spark seam
  /** Tag row the decode UDF emits per element. */
  final case class TagRow(group: Int, element: Int, vr: String,
                          keyword: Option[String], value: Option[String])

  /** `array<struct<group,element,vr,keyword,value>>` of all top-level
    * elements in a DICOM payload column — the real S11 decode. A Scala
    * UDF by design: a binary format walk has nothing for Catalyst to
    * codegen, and the per-row cost is dominated by the byte scan
    * itself. Deterministic: same bytes, same rows. */
  def dicomTags(payload: Column): Column = dicomTagsUdf(payload)

  private lazy val dicomTagsUdf = udf((b: Array[Byte]) =>
    if (b == null) null
    else elements(b).map(e =>
      TagRow(e.group, e.element, e.vr, keyword(e.group, e.element), e.value)))

  /** Anonymized copy of a DICOM payload column (reference semantics:
    * all ANONYMIZATION_FIELDS blanked, PatientsName replaced). */
  def dicomAnonymize(payload: Column, patientName: String = "anonymous"): Column =
    udf((b: Array[Byte]) =>
      if (b == null) null else anonymize(b, patientName)).apply(payload)
}
