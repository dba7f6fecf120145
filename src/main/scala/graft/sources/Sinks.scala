package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Result row of one file copy in [[Sinks.copyDataset]]. */
case class CopyResult(src: String, dest: String, bytes: Long, ok: Boolean)

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
    // Hadoop filesystems report many rename failures by returning false
    // rather than throwing — a silent false here would delete the staged
    // output below and publish nothing.
    if (!fs.rename(part, target))
      sys.error(s"writeTsvFile: rename $part -> $target failed")
    fs.delete(stage, true)
  }

  /** K9: dataset copy (copy-dataset/script.py:12-27). The reference is a
    * driver-side `shutil.copytree`; Spark-native shape: enumerate the
    * source tree as metadata rows (no payload materialized) and copy each
    * file executor-side in `mapPartitions` — a 100 TB dataset copies with
    * cluster parallelism, task retry re-copies only the failed partition
    * (per-file overwrite makes retries idempotent). Relative structure is
    * preserved under `destDir`; returns one (src, dest, bytes, ok) row
    * per file for the caller's completeness check. */
  def copyDataset(spark: SparkSession, srcDir: String, destDir: String): Dataset[CopyResult] = {
    import spark.implicits._
    val dest = destDir.stripSuffix("/")
    val files = Files.binaryScan(spark, srcDir)
      .select(col("path"), col("length")).as[(String, Long)]
    files.mapPartitions { it =>
      // Fresh Configuration per task: picks up the cluster's core-site
      // from the executor classpath, so the same code copies file:// or
      // hdfs:// URIs.
      import org.apache.hadoop.conf.Configuration
      import org.apache.hadoop.fs.{FileUtil, Path}
      val conf = new Configuration()
      // Qualify the caller-spelled base through the FS so it compares
      // against the scheme-qualified URIs binaryScan returns — a raw
      // substring match misses on scheme/authority spelling differences
      // ('file:/x' vs '/x', 'hdfs://nn' vs 'hdfs://nn.fqdn').
      val basePath = new Path(srcDir.stripSuffix("/"))
      val baseUri =
        basePath.getFileSystem(conf).makeQualified(basePath).toUri
      it.map { case (src, bytes) =>
        val from = new Path(src)
        val srcUri = from.getFileSystem(conf).makeQualified(from).toUri
        val rel = baseUri.relativize(srcUri).getPath
        // relativize returns the child unchanged (absolute path) when
        // it is not under the base
        if (rel.startsWith("/") || rel.isEmpty)
          sys.error(s"copyDataset: $src is not under $baseUri")
        val to = new Path(s"$dest/$rel")
        // Unwrap ChecksumFileSystem: the copied TREE must be
        // byte-identical to the source — Hadoop's local FS otherwise
        // plants .crc sidecars inside the dataset copy, which a
        // completeness audit of the destination would flag as extras.
        def raw(fs: org.apache.hadoop.fs.FileSystem) = fs match {
          case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
          case f => f
        }
        val ok = FileUtil.copy(raw(from.getFileSystem(conf)), from,
          raw(to.getFileSystem(conf)), to, false, true, conf)
        CopyResult(src, to.toString, bytes, ok)
      }
    }
  }

  /** K9's ACL grant (copy-dataset/script.py:19-30 `setfacl -m
    * u:<userid>:r-x <dest>`): an OS side effect, routed through the
    * external-process harness like every other shell-out (K4-K7) — with
    * its dryrun seam for environments where setfacl/the target FS do not
    * exist. One invocation per dataset root, not per file. */
  def aclGrant(roots: Dataset[String], userid: String,
               dryrun: Boolean = false): Dataset[graft.exec.ExecResult] =
    graft.exec.External.execRows(roots,
      p => Seq("setfacl", "-m", s"u:$userid:r-x", p),
      timeoutSec = 60L, dryrun = dryrun)

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

  /** K4 engine-side: the project-inquiry mail the reference's reporting
    * plugin assembles (mail-inquiry.py:22-41 — MIMEMultipart with a
    * templated text part and a base64 TSV attachment named
    * `<project>_plan.tsv`) rendered as a deterministic RFC-2822 string
    * column. Differences from Python's mime lib, by design: the
    * multipart boundary is a CALLER-SUPPLIED constant (Python draws a
    * random one — useless for exactly-once sinks and replay tests) and
    * base64 is unchunked. SMTP transport stays external (exec harness,
    * K4's by-design seam); this is the message-construction half, which
    * is the reference logic worth gating. */
  def renderInquiryMail(from: Column, to: Column, user: Column,
                        project: Column, space: Column, tsv: Column,
                        boundary: String = "=_graft_part"): Column = {
    val nl = lit("\n")
    val bd = lit(s"--$boundary")
    concat(
      lit("From: "), from, nl,
      lit("To: "), to, nl,
      lit("Subject: "), user,
      lit(" would like to register the new project "), project, nl,
      lit("MIME-Version: 1.0\n"),
      lit(s"""Content-Type: multipart/mixed; boundary="$boundary"""" + "\n\n"),
      bd, nl,
      lit("Content-Type: text/plain\n\nHi,\n\n"),
      user, lit(" would like to register the Project "), project,
      lit(" in Space "), space,
      lit(".\nI've attached the project TSV for you.\n\n" +
        "Have a nice day,\nYour friendly mail service plugin.\n\n"),
      bd, nl,
      lit("Content-Type: application/octet-stream\n" +
        "Content-Transfer-Encoding: base64\n" +
        "Content-Disposition: attachment; filename=\""),
      project, lit("_plan.tsv\"\n\n"),
      base64(tsv.cast("binary")), nl,
      bd, lit("--"))
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
