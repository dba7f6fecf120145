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
  * and deflated syntaxes are rejected loudly. [[elements]] walks
  * sequences structurally (defined lengths skipped exactly; undefined
  * lengths scanned to their (FFFE,E0DD) delimiter) without descending —
  * it reports top-level tags. [[anonymize]] DOES descend into SQ items
  * (PS3.5 §7.5) so nested anonymization-set attributes are blanked too.
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
  private val UndefLen = 0xFFFFFFFFL

  /** Parsed element header: tag, VR (UN when implicit), raw 32-bit
    * length (may be [[UndefLen]]), and the value's byte offset. */
  private final case class Header(group: Int, element: Int, vr: String,
                                  len: Long, valOff: Int)

  /** Decode one element header at `pos` under the given form. Defined
    * lengths are validated in Long arithmetic against the buffer size —
    * a 32-bit length in [2^31, 0xFFFFFFFE] would otherwise turn negative
    * under `.toInt`, slip past an `valOff + l > bytes.length` guard, and
    * walk the cursor backwards (an infinite loop on crafted/corrupt
    * payload bytes, not an exception). */
  private def parseHeader(buf: ByteBuffer, bytes: Array[Byte], pos: Int,
                          explicit: Boolean): Header = {
    val group = buf.getShort(pos) & 0xFFFF
    val element = buf.getShort(pos + 2) & 0xFFFF
    var vr = "UN"
    var len = 0L
    var valOff = 0
    if (explicit) {
      vr = new String(bytes, pos + 4, 2, StandardCharsets.US_ASCII)
      if (LongFormVrs.contains(vr)) {
        len = buf.getInt(pos + 8) & 0xFFFFFFFFL; valOff = pos + 12
      } else {
        len = buf.getShort(pos + 6) & 0xFFFFL; valOff = pos + 8
      }
    } else {
      len = buf.getInt(pos + 4) & 0xFFFFFFFFL; valOff = pos + 8
    }
    if (len != UndefLen && valOff + len > bytes.length)
      throw new IllegalArgumentException(
        f"truncated DICOM element ($group%04x,$element%04x) at $pos " +
          s"(declared length $len exceeds buffer)")
    Header(group, element, vr, len, valOff)
  }

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
      if (inMeta && (buf.getShort(pos) & 0xFFFF) != 0x0002) {
        inMeta = false; explicit = mainExplicit
      }
      val useExplicit = if (inMeta) true else explicit
      val h = parseHeader(buf, bytes, pos, useExplicit)
      val group = h.group
      val element = h.element
      val vr = h.vr
      val len = h.len
      val valOff = h.valOff
      if (len == UndefLen) {
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
        val l = len.toInt // safe: parseHeader bounded len by bytes.length
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
      if (l != UndefLen && p + 8 + l > bytes.length)
        throw new IllegalArgumentException(
          s"truncated DICOM sequence item at $p (declared length $l exceeds buffer)")
      p = if (l == UndefLen) skipItemContent(buf, bytes, p + 8, explicit)
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
      // (parseHeader rejects defined lengths past the buffer, so the
      // cursor below always moves forward)
      val h = parseHeader(buf, bytes, p, explicit)
      p = if (h.len == UndefLen)
            skipSequenceContent(buf, bytes, h.valOff, explicit) + 8
          else h.valOff + h.len.toInt
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
    * length per PS3.5 §6.2 — padding computed on the ENCODED bytes, not
    * the char count, so a multi-byte patient name can't emit an
    * odd-length value. Stale (gggg,0000) group-length elements outside
    * file-meta are dropped (retired in the standard; a length rewrite
    * would invalidate them anyway).
    *
    * Sequences are DESCENDED (PS3.5 §7.5): anonymization-set tags inside
    * SQ items are blanked just like top-level ones, so a person name
    * nested in e.g. a content sequence can't survive; anonymization-set
    * tags that are THEMSELVES sequences (the *IDSequence attributes) are
    * emptied outright, matching the reference's set-to-'' semantics.
    * Rewritten items/sequences are re-encoded with defined lengths
    * recomputed from the rewritten content (undefined-length runs keep
    * their delimiters). Explicit-VR undefined-length non-SQ runs (e.g.
    * encapsulated pixel data, whose items are raw fragments rather than
    * element streams) are copied verbatim. */
  def anonymize(bytes: Array[Byte], patientName: String = "anonymous"): Array[Byte] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    // same 4-byte magic check as elements() — testing only bytes(131)
    // would mistake a preamble-less stream with 'M' at offset 131 for a
    // preambled one and duplicate its first 132 bytes
    val hasPreamble = bytes.length >= 132 &&
      bytes(128) == 'D' && bytes(129) == 'I' && bytes(130) == 'C' && bytes(131) == 'M'
    if (hasPreamble) out.write(bytes, 0, 132)
    var pos = if (hasPreamble) 132 else 0
    var inMeta = hasPreamble
    var explicit = if (hasPreamble) true else looksExplicit(bytes, 0)
    var mainExplicit = explicit
    while (pos + 8 <= bytes.length) {
      if (inMeta && (buf.getShort(pos) & 0xFFFF) != 0x0002) {
        inMeta = false; explicit = mainExplicit
      }
      val useExplicit = if (inMeta) true else explicit
      val h = parseHeader(buf, bytes, pos, useExplicit)
      if (inMeta && h.group == 0x0002 && h.element == 0x0010) {
        renderString(bytes, h.valOff, h.len.toInt) match {
          case ExplicitLE => mainExplicit = true
          case ImplicitLE => mainExplicit = false
          case other => throw new IllegalArgumentException(
            s"unsupported DICOM transfer syntax: $other")
        }
      }
      pos = rewriteElement(buf, bytes, h, pos, useExplicit, out, patientName)
    }
    out.toByteArray
  }

  /** Rewrite one element (at `pos`, header `h`) into `out`; returns the
    * position just past it in the SOURCE bytes. Recursion root for the
    * sequence descent. */
  private def rewriteElement(buf: ByteBuffer, bytes: Array[Byte], h: Header,
                             pos: Int, explicit: Boolean,
                             out: java.io.ByteArrayOutputStream,
                             patientName: String): Int = {
    val inAnonSet = keywordByTag.contains((h.group, h.element))
    val lenFieldBytes = if (!explicit || h.valOff - pos == 12) 4 else 2
    def writeHeaderWithLength(n: Int): Unit = {
      out.write(bytes, pos, (h.valOff - lenFieldBytes) - pos)
      writeLength(out, lenFieldBytes, n)
    }
    if (h.element == 0x0000 && h.group != 0x0002) {
      // stale group length: drop
      if (h.len == UndefLen)
        throw new IllegalArgumentException(
          f"group-length element (${h.group}%04x,0000) with undefined length at $pos")
      h.valOff + h.len.toInt
    } else if (h.len == UndefLen) {
      // UN with undefined length is an implicit-VR-encoded SQ per PS3.5
      // §6.2.2 — its item CONTENT is implicit even in an explicit file
      val childExplicit = if (h.vr == "UN") false else explicit
      val delim = skipSequenceContent(buf, bytes, h.valOff, childExplicit)
      // implicit-VR undefined length is necessarily SQ (encapsulation
      // needs explicit VR); explicit OB/OW undefined runs are fragment
      // streams, copied verbatim
      val isSeq = h.vr == "SQ" || h.vr == "UN" || !explicit
      if (inAnonSet && isSeq) {
        writeHeaderWithLength(0) // empty the sequence (set-to-'' semantics)
      } else if (isSeq) {
        out.write(bytes, pos, h.valOff - pos) // header, undefined length kept
        rewriteItemStream(buf, bytes, h.valOff, delim, childExplicit, out, patientName)
        out.write(bytes, delim, 8)            // (FFFE,E0DD) delimiter
      } else {
        out.write(bytes, pos, delim + 8 - pos)
      }
      delim + 8
    } else if (h.vr == "SQ") {
      // defined-length sequence: rewrite items, re-encode the length
      if (inAnonSet) writeHeaderWithLength(0)
      else {
        val content = new java.io.ByteArrayOutputStream()
        rewriteItemStream(buf, bytes, h.valOff, h.valOff + h.len.toInt,
          explicit, content, patientName)
        writeHeaderWithLength(content.size())
        content.writeTo(out)
      }
      h.valOff + h.len.toInt
    } else {
      val l = h.len.toInt
      // Implicit VR (and explicit UN, whose content is implicit-encoded
      // per PS3.5 §6.2.2) can carry a DEFINED-length sequence that is
      // indistinguishable from a scalar without a full data dictionary.
      // Structure-sniff it — the standard fallback: a well-formed item
      // stream filling the value exactly is a sequence; anything that
      // merely starts with item-tag-like bytes but doesn't validate to
      // the end is copied verbatim as data.
      val seqLike = (!explicit || h.vr == "UN") && l >= 8 &&
        isItemStream(buf, bytes, h.valOff, h.valOff + l)
      if (seqLike) {
        if (inAnonSet) writeHeaderWithLength(0)
        else {
          val content = new java.io.ByteArrayOutputStream()
          rewriteItemStream(buf, bytes, h.valOff, h.valOff + l,
            explicit = false, content, patientName)
          writeHeaderWithLength(content.size())
          content.writeTo(out)
        }
      } else {
        val hasStringValue = StringVrs.contains(h.vr) ||
          (!explicit && isPrintable(bytes, h.valOff, l))
        if (inAnonSet && hasStringValue) {
          val replacement =
            if (h.group == 0x0010 && h.element == 0x0010) patientName else ""
          val raw = replacement.getBytes(StandardCharsets.UTF_8)
          val vbytes = if (raw.length % 2 == 0) raw else raw :+ ' '.toByte
          writeHeaderWithLength(vbytes.length)
          out.write(vbytes)
        } else {
          out.write(bytes, pos, h.valOff + l - pos) // verbatim
        }
      }
      h.valOff + l
    }
  }

  /** True iff [from, until) is a WELL-FORMED item stream: consecutive
    * (FFFE,E000) items whose lengths (or delimiters, walked implicitly)
    * land exactly on `until`, AND whose item CONTENT parses as an
    * implicit element stream to exactly the item end. Framing alone is
    * not enough — the rewrite will parse the content as elements, so
    * binary data that merely frames like an item (e.g. pixel bytes
    * starting FFFE E000) must be rejected here and copied verbatim, not
    * crashed on or silently truncated. Used to detect defined-length
    * sequences in implicit-VR / UN elements, where the header can't
    * say. */
  private def isItemStream(buf: ByteBuffer, bytes: Array[Byte],
                           from: Int, until: Int): Boolean = {
    var p = from
    try {
      while (p < until) {
        if (p + 8 > until) return false
        val g = buf.getShort(p) & 0xFFFF
        val e = buf.getShort(p + 2) & 0xFFFF
        if (g != 0xFFFE || e != 0xE000) return false
        val l = buf.getInt(p + 4) & 0xFFFFFFFFL
        if (l == UndefLen) p = skipItemContent(buf, bytes, p + 8, explicit = false)
        else {
          if (p + 8 + l > until) return false
          if (!isElementStream(buf, bytes, p + 8, p + 8 + l.toInt)) return false
          p = p + 8 + l.toInt
        }
      }
      p == until
    } catch { case _: IllegalArgumentException => false }
  }

  /** True iff [from, until) parses as an IMPLICIT-VR element run whose
    * headers and lengths land exactly on `until` — the same walk
    * [[rewriteElements]] will take, validated up front. Nested
    * undefined-length runs are walked structurally; nested
    * defined-length values are treated as opaque (if they are in turn
    * sequences, the rewrite re-sniffs them with this same check). */
  private def isElementStream(buf: ByteBuffer, bytes: Array[Byte],
                              from: Int, until: Int): Boolean = {
    var p = from
    while (p + 8 <= until) {
      val h = parseHeader(buf, bytes, p, explicit = false)
      if (h.len == UndefLen) {
        val delim = skipSequenceContent(buf, bytes, h.valOff, explicit = false)
        if (delim + 8 > until) return false
        p = delim + 8
      } else {
        if (h.valOff + h.len > until) return false
        p = h.valOff + h.len.toInt
      }
    }
    p == until
  }

  /** Rewrite a sequence's item stream in [from, until): each item's
    * element content recurses through [[rewriteElement]]; defined item
    * lengths are recomputed from the rewritten content. */
  private def rewriteItemStream(buf: ByteBuffer, bytes: Array[Byte],
                                from: Int, until: Int, explicit: Boolean,
                                out: java.io.ByteArrayOutputStream,
                                patientName: String): Unit = {
    var p = from
    while (p + 8 <= until) {
      val g = buf.getShort(p) & 0xFFFF
      val e = buf.getShort(p + 2) & 0xFFFF
      if (g != 0xFFFE || e != 0xE000)
        throw new IllegalArgumentException(
          f"malformed DICOM sequence: expected item tag at $p, got ($g%04x,$e%04x)")
      val l = buf.getInt(p + 4) & 0xFFFFFFFFL
      if (l == UndefLen) {
        val end = skipItemContent(buf, bytes, p + 8, explicit) // past (FFFE,E00D)
        out.write(bytes, p, 8) // item header, undefined length kept
        rewriteElements(buf, bytes, p + 8, end - 8, explicit, out, patientName)
        out.write(bytes, end - 8, 8) // item delimiter
        p = end
      } else {
        if (p + 8 + l > bytes.length)
          throw new IllegalArgumentException(
            s"truncated DICOM sequence item at $p (declared length $l exceeds buffer)")
        val content = new java.io.ByteArrayOutputStream()
        rewriteElements(buf, bytes, p + 8, p + 8 + l.toInt, explicit,
          content, patientName)
        out.write(bytes, p, 4) // (FFFE,E000)
        writeLength(out, 4, content.size())
        content.writeTo(out)
        p = p + 8 + l.toInt
      }
    }
  }

  /** Rewrite an ordinary element run in [from, until) (an item's
    * content) through [[rewriteElement]]. */
  private def rewriteElements(buf: ByteBuffer, bytes: Array[Byte],
                              from: Int, until: Int, explicit: Boolean,
                              out: java.io.ByteArrayOutputStream,
                              patientName: String): Unit = {
    var p = from
    while (p + 8 <= until) {
      val h = parseHeader(buf, bytes, p, explicit)
      p = rewriteElement(buf, bytes, h, p, explicit, out, patientName)
    }
  }

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
