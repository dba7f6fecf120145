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
  * `try_to_date` chain: ANSI-safe (no parse exceptions), codegen'd, and
  * each branch only fires when earlier ones returned null, so the common
  * format should be listed first in hot paths.
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
    coalesce(Formats.map(f => try_to_date(s, f)) :+ yyPivoted: _*)
  }
}
