package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** QBiC sample-barcode functions.
  *
  * Scheme (reference: drop-boxes/register-fastq-dropbox/register-fastq-dropbox.py:21,
  * checksum algorithm drop-boxes/register-iontorrent-data/register-iontorrent-data.py:79-94):
  * 10 chars = 'Q' + 4 project chars + 3 digits + class letter + checksum char,
  * where checksum = map34(sum_{i=1..9} ord(c_i) * i mod 34) and
  * map34 sends 0-9 to '0'-'9' and 10-33 to 'A'-'X'.
  *
  * Everything here is a pure column expression — whole-stage-codegen'd,
  * no UDFs — so barcode validation stays inside the scan's codegen stage
  * and survives a 100 TB fact-table pass.
  */
object Barcode {
  /** Barcode regex, identical across ~30 reference scripts
    * (register-fastq-dropbox.py:21). */
  val Rx = "Q\\w{4}[0-9]{3}[a-zA-Z]\\w"

  /** Weighted ord-sum of the first 9 chars (1-indexed weights). */
  private def weightedSum(code: Column): Column =
    (1 to 9).map(i => ascii(substring(code, i, 1)) * lit(i)).reduce(_ + _)

  /** Checksum character for a code's 9-char prefix
    * (register-iontorrent-data.py:84-94 `map_to_char`/`create_checksum`).
    * Routed through the native `qbic_checksum` expression: ONE codegen'd
    * call whose child is evaluated once. The pure-column alternative
    * ([[checksumCharColumnar]]) duplicates its child into all 9 weighted
    * positions, which multiplies generated code when composed —
    * `isValid(make(...))` chains breached Janino's 64 KB method limit
    * and fell out of whole-stage codegen. Requires the `qbic_checksum`
    * registration every graft entry point performs (GraftExtensions). */
  def checksumChar(code: Column): Column = call_function("qbic_checksum", code)

  /** The checksum as pure built-in columns — works WITHOUT
    * GraftExtensions, at the cost of 9 duplicated child evaluations;
    * QbicChecksumSpec holds the two implementations equal. */
  def checksumCharColumnar(code: Column): Column = {
    val m = weightedSum(code) % 34 + 48
    char(when(m > 57, m + 7).otherwise(m))
  }

  /** `isExpected` (register-fastq-dropbox.py:39-45): shape + checksum. */
  def isValid(code: Column): Column =
    code.rlike("^" + Rx + "$") && checksumChar(code) === substring(code, 10, 1)

  /** First barcode occurrence in a string (P1). */
  def extract(s: Column): Column = regexp_extract(s, Rx, 0)

  /** Distinct barcode matches in a string — the >1-match disambiguation
    * guard of register-mtb-data-dropbox.py:435-440. */
  def distinctMatches(s: Column): Column =
    size(array_distinct(regexp_extract_all(s, lit(Rx), lit(0))))

  /** Build a full barcode from a 5-char project code (incl. leading 'Q'),
    * a counter and a class char (`create_barcode`,
    * register-iontorrent-data.py:91-94). */
  def make(project: Column, n: Column, classChar: Column): Column = {
    val prefix = concat(project, lpad(n.cast("string"), 3, "0"), classChar)
    concat(prefix, checksumChar(prefix))
  }

  /** Project-code prefix of a barcode. */
  def project(code: Column): Column = substring(code, 1, 5)
}
