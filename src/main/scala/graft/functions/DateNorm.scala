package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-format date normalizer (SURVEY §2.8 F4).
  *
  * The reference parses six date shapes: `%y%m%d` (etl_msconvert.py:602),
  * ISO-8601 `%Y-%m-%dT%H:%M:%SZ` (etl_msconvert.py:245), ISO with
  * microseconds (register-nanopore.py:102-105), `%d.%m.%Y`
  * (register-omero.py:63-64), `%d-%m-%Y` (reg-exp.py:4-11), `%Y%m%d`
  * (register-imaging-dropbox.py:146-151).
  *
  * Single-parse dispatch: the seven formats have DISJOINT surface
  * shapes (length, separator position), so a cheap CASE on
  * length/char classifies each row to its one format and runs exactly
  * ONE `try_to_date` — the naive `coalesce(try_to_date…)` chain this
  * replaced attempted up to seven parses per row (a row in the LAST
  * format paid all six failures first; q_dates measured it creeping
  * as the corpus's format mix shifted). ANSI-safe (try_to_date never
  * throws), fully codegen'd, and a string matching no shape is null
  * under both designs.
  */
object DateNorm {
  /** Two-digit years parse to 2000-2099 under Java's formatter; C strptime
    * (the reference's `%y%m%d`, etl_msconvert.py:602) pivots at 69: yy 69-99
    * → 19xx, 00-68 → 20xx. Anything above 2068 pivots back a century. */
  private val Pivot = 2068

  val Formats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd",
    "dd.MM.yyyy",
    "dd-MM-yyyy",
    "yyyyMMdd")

  def normalize(s: Column): Column = {
    val yy = try_to_date(s, "yyMMdd")
    val yyPivoted = when(year(yy) > Pivot, add_months(yy, -1200)).otherwise(yy)
    val len = length(s)
    // shape dispatch: length alone separates everything except the
    // three 10-char formats, which split on the separator character
    // and its position (index 5 '-' ⇔ ISO year-first; index 3 '.' vs
    // '-' ⇔ the two day-first forms)
    when(len === 20, try_to_date(s, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .when(len === 26, try_to_date(s, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
      .when(len === 10 && substring(s, 5, 1) === "-",
        try_to_date(s, "yyyy-MM-dd"))
      .when(len === 10 && substring(s, 3, 1) === ".",
        try_to_date(s, "dd.MM.yyyy"))
      .when(len === 10 && substring(s, 3, 1) === "-",
        try_to_date(s, "dd-MM-yyyy"))
      .when(len === 8, try_to_date(s, "yyyyMMdd"))
      .when(len === 6, yyPivoted)
      .otherwise(lit(null).cast("date"))
  }
}
