package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Amino-acid nomenclature translation (SURVEY §2.8 F5).
  *
  * The reference converts snpEff 3-letter protein-change strings
  * (`p.Ala123Thr`) to 1-letter form (`A123T`) via a mapping table and the
  * regex split `([a-zA-Z\*\?]+)([0-9]+)([a-zA-Z\*\?]+)` (vcf2xml.py:54-98).
  * The 3→1 letter code table is standard IUPAC biochemistry.
  *
  * Implemented as a chain of literal replacements inside one column
  * expression — codegen'd, no UDF, no driver lookup.
  */
object AminoAcid {
  /** IUPAC 3-letter → 1-letter amino-acid codes ('*' = stop). */
  val ThreeToOne: Seq[(String, String)] = Seq(
    "Ala" -> "A", "Arg" -> "R", "Asn" -> "N", "Asp" -> "D", "Cys" -> "C",
    "Gln" -> "Q", "Glu" -> "E", "Gly" -> "G", "His" -> "H", "Ile" -> "I",
    "Leu" -> "L", "Lys" -> "K", "Met" -> "M", "Phe" -> "F", "Pro" -> "P",
    "Ser" -> "S", "Thr" -> "T", "Trp" -> "W", "Tyr" -> "Y", "Val" -> "V",
    "Ter" -> "*")

  /** Replace every 3-letter code with its 1-letter code. */
  def toOneLetter(c: Column): Column =
    ThreeToOne.foldLeft(c) { case (acc, (three, one)) =>
      regexp_replace(acc, three, one)
    }

  /** Split a protein-change string into (ref, position, alt) — the
    * reference's mutation regex. Returns a struct; empty strings when the
    * shape doesn't match. */
  def mutationParts(c: Column): Column = {
    val rx = "([a-zA-Z\\*\\?]+)([0-9]+)([a-zA-Z\\*\\?]+)"
    struct(
      regexp_extract(c, rx, 1).as("ref"),
      regexp_extract(c, rx, 2).as("pos"),
      regexp_extract(c, rx, 3).as("alt"))
  }

  /** Full normalization: strip a leading `p.`, translate to 1-letter. */
  def normalizeProteinChange(c: Column): Column =
    toOneLetter(regexp_replace(c, "^p\\.", ""))
}
