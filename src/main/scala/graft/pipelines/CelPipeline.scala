package graft.pipelines

import graft.functions.Barcode
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CEL/microarray metadata extraction
  * (register-microarrays-dropbox/register-cel-dropbox.py:48-79
  * `parseMetadata`): the facility's PDF (extracted to text via the
  * pdftotext exec seam) is scanned with a little state machine —
  * after an "Auftragsnummer" line the next line starting with "I" is the
  * order number; after a "RIN Nummer" line, a barcode line names the
  * current sample and the next numeric line (German comma decimals) is
  * that sample's RIN.
  *
  * Declarative form: per-document carried state is a `last(_, ignoreNulls)
  * ` running window over the line number — the standard Spark shape for
  * "value from the closest preceding marker line". The window partitions
  * by document, so a million PDFs process in parallel; within one
  * document the order dependence is intrinsic to the format.
  */
object CelPipeline {
  /** German comma-decimal → double ("7,6" → 7.6), the reference's
    * `line.replace(',', '.')` normalizer (:71). */
  def germanDecimal(c: Column): Column =
    regexp_replace(c, ",", ".").try_cast("double")

  /** A line that is a RIN value: digits with an optional single comma
    * group (the reference's `line.replace(',','',1).isdigit()`). */
  def isRinValue(c: Column): Column = c.rlike("^[0-9]+(,[0-9]+)?$")

  /** Explode (id, text) documents into trimmed (id, line_no, line) rows. */
  def lines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("line", trim(col("line")))

  /** (id, barcode, rin) associations: barcodes appearing after the
    * "RIN Nummer" marker, each paired with its FIRST following numeric
    * line (the reference's one-shot numFlag), comma-normalized. */
  def rinAssociations(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ls = lines(docs, idCol, textCol)
    val perDoc = Window.partitionBy("id")
    val byLine = Window.partitionBy("id").orderBy("line_no")
    val tagged = ls
      .withColumn("__rin_start",
        min(when(col("line").contains("RIN Nummer"), col("line_no"))).over(perDoc))
      .filter(col("__rin_start").isNotNull && col("line_no") > col("__rin_start"))
      .withColumn("__code",
        when(col("line").rlike(Barcode.Rx), Barcode.extract(col("line"))))
      .withColumn("barcode", last(col("__code"), ignoreNulls = true).over(byLine))
    tagged
      .filter(isRinValue(col("line")) && col("barcode").isNotNull)
      .groupBy(col("id"), col("barcode"))
      // first numeric line after the barcode wins (numFlag semantics)
      .agg(min_by(col("line"), col("line_no")).as("__raw"))
      .select(col("id"), col("barcode"), germanDecimal(col("__raw")).as("rin"))
  }

  /** Order number: the first line starting with "I" after the
    * "Auftragsnummer" marker (:60-62). One row per document that has one. */
  def orderNumbers(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ls = lines(docs, idCol, textCol)
    val perDoc = Window.partitionBy("id")
    ls.withColumn("__start",
        min(when(col("line") === "Auftragsnummer", col("line_no"))).over(perDoc))
      .filter(col("__start").isNotNull && col("line_no") > col("__start") &&
        col("line").startsWith("I"))
      .groupBy(col("id"))
      .agg(min_by(col("line"), col("line_no")).as("order_number"))
  }
}
