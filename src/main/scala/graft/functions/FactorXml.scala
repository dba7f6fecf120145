package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parse direction for the `Q_PROPERTIES` factor XML — the inverse of
  * [[graft.sources.Sinks.xmlElement]]'s build direction.
  *
  * The reference stores experimental factors as an XML property string
  * (template at `etl_msconvert.py:528`):
  * {{{
  * <?xml version="1.0" ...?> <qproperties> <qfactors>
  *   <qcategorical label="technical_replicate" value="1"/>
  *   ... </qfactors> </qproperties>
  * }}}
  * and downstream consumers either copy it opaquely
  * (`register-cel-dropbox.py:168`) or ship it to the portal for parsing
  * (`get-property-tsv/script.py:29`). This operator gives the engine the
  * portal's side: a queryable `array<struct<ftype,label,value,unit>>`
  * per row, so "filter samples by a factor value" is one `exists()` or
  * explode away. Built on Spark's native `from_xml` (codegen'd parse, no
  * UDF); `qcategorical` carries (label, value), `qcontinous` — the
  * format's continuous-factor element — additionally a `unit`.
  * Repeated elements of either kind map to arrays; a missing or empty
  * `<qfactors>` yields an empty result array (never NULL), so
  * `explode_outer` keeps the row.
  */
object FactorXml {
  private val catType = ArrayType(StructType(Seq(
    StructField("_label", StringType), StructField("_value", StringType))))
  private val contType = ArrayType(StructType(Seq(
    StructField("_label", StringType), StructField("_value", StringType),
    StructField("_unit", StringType))))

  /** Schema of the `<qproperties>` document root for `from_xml`. */
  val propertiesSchema: StructType = StructType(Seq(
    StructField("qfactors", StructType(Seq(
      StructField("qcategorical", catType),
      StructField("qcontinous", contType))))))

  /** One output factor: kind tag, label, value, unit (NULL for
    * categorical factors). */
  val factorType: StructType = StructType(Seq(
    StructField("ftype", StringType), StructField("label", StringType),
    StructField("value", StringType), StructField("unit", StringType)))

  /** `array<struct<ftype,label,value,unit>>` of all factors in a
    * Q_PROPERTIES XML string — categorical factors first, then
    * continuous, each kind in document order. Unparseable or
    * factor-less input gives an empty array. */
  def parseFactors(xml: Column): Column = {
    val parsed = from_xml(xml, propertiesSchema)
    val cats = coalesce(parsed.getField("qfactors").getField("qcategorical"),
      array().cast(catType))
    val conts = coalesce(parsed.getField("qfactors").getField("qcontinous"),
      array().cast(contType))
    concat(
      transform(cats, x => struct(
        lit("categorical").as("ftype"), x.getField("_label").as("label"),
        x.getField("_value").as("value"), lit(null).cast("string").as("unit"))),
      transform(conts, x => struct(
        lit("continuous").as("ftype"), x.getField("_label").as("label"),
        x.getField("_value").as("value"), x.getField("_unit").as("unit"))))
  }

  /** Convenience predicate: does any factor with `label` carry `value`?
    * (the portal's "filter samples by factor" operation). */
  def hasFactor(xml: Column, label: String, value: String): Column =
    exists(parseFactors(xml),
      f => f.getField("label") === label && f.getField("value") === value)
}
