package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Property-map column operations (SURVEY §2.8 F11, §2.3 P6) — the
  * reference's dict munging (register-omero.py:216-281) as map
  * expressions: filter/normalize/placeholder-drop without UDFs.
  */
object MapOps {
  /** P6: drop blacklisted keys before an external push
    * (`filterOmeroPropertyMap`). */
  def dropKeys(m: Column, blacklist: Seq[String]): Column =
    map_filter(m, (k, _) => !k.isin(blacklist.map(lit): _*))

  /** P6: drop entries whose value is the `*` placeholder
    * (register-omero.py:231-232). */
  def dropPlaceholders(m: Column, placeholder: String = "*"): Column =
    map_filter(m, (_, v) => v =!= placeholder)

  /** F11: lower-case all keys (header normalization,
    * register-omero.py:198-202 upper/lower discipline). */
  def lowerKeys(m: Column): Column = transform_keys(m, (k, _) => lower(k))

  /** F11: trim all values. */
  def trimValues(m: Column): Column = transform_values(m, (_, v) => trim(v))
}
