package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Export sinks (SURVEY §2.2 K3/K8, §2.8 F10).
  *
  * The reference's reports are `tableBuilder` tables and its exports are
  * TSV/XML files. Spark-native: the report IS the query's DataFrame;
  * exports are `df.write` with the right options, or a column expression
  * rendering XML — no driver-side string building loops.
  */
object Sinks {
  /** K8: variant-TSV-style export (register-iontorrent-data.py:504-518).
    * `header = false` matches the reference's raw headerless exports. */
  def writeTsv(df: DataFrame, path: String, singleFile: Boolean = false,
               header: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("sep", "\t").option("header", header.toString).csv(path)
  }

  /** K8, single-FILE form: stage [[writeTsv]]'s one-part output and
    * publish it at exactly `file` (the reference's exports are single
    * named files, register-iontorrent-data.py:504-518). Hadoop FS API,
    * so the same rename-publish works on a cluster filesystem. */
  def writeTsvFile(df: DataFrame, file: String,
                   header: Boolean = true): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(file)
    val stage = new Path(file + ".stage")
    val fs = target.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    writeTsv(df, stage.toString, singleFile = true, header = header)
    val part = fs.listStatus(stage).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file under $stage"))
    if (!fs.exists(target.getParent)) fs.mkdirs(target.getParent)
    if (fs.exists(target)) fs.delete(target, false)
    fs.rename(part, target)
    fs.delete(stage, true)
  }

  /** F10: render one XML element per row from a (tag, attrs, body)
    * column spec — the declarative form of the reference's PyXB/DOM
    * building (createGenevarsCxxCVs.py:96-151). Attribute values are
    * XML-escaped. */
  def xmlElement(tag: String, attrs: Seq[(String, Column)], body: Column): Column = {
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(c,
        "&", "&amp;"), "<", "&lt;"), "\"", "&quot;")
    val attrStr = attrs.map { case (k, v) =>
      concat(lit(s""" $k=""""), esc(v), lit("\""))
    }.foldLeft(lit(""): Column)(concat(_, _))
    concat(lit(s"<$tag"), attrStr, lit(">"), esc(body), lit(s"</$tag>"))
  }

  /** Q_NOTES append (add-to-xml-note/edit-note.py:17-31): read a
    * `<notes>…</notes>` property value, drop its closing tag, append one
    * `<note><comment/><time/><username/></note>` block and re-close. A
    * NULL (unset) property starts a fresh `<notes>`. Faithful to the
    * reference line-scan — including its quirk of re-joining the kept
    * lines without newlines — so n sequential appends produce exactly
    * what the Jython plugin would have written. */
  def appendNote(xml: Column, comment: Column, time: Column, user: Column): Column = {
    val kept = array_join(
      filter(split(xml, "\n"), l => !l.contains("</notes>")), "")
    val base = when(xml.isNull, lit("<notes>")).otherwise(kept)
    concat(base,
      lit("\n<note>\n"),
      lit("<comment>"), comment, lit("</comment>\n"),
      lit("<time>"), time, lit("</time>\n"),
      lit("<username>"), user, lit("</username>\n"),
      lit("</note>\n"),
      lit("</notes>"))
  }
}
