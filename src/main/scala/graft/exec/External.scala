package graft.exec

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Result row of one external-tool invocation. */
case class ExecResult(input: String, cmd: Seq[String], exitCode: Int,
                      stdout: String, stderr: String, dryrun: Boolean)

/** External-process transform harness (SURVEY §2.9 X1-X7).
  *
  * The reference shells out per file — msconvert over ssh (etl_msconvert.py:182-218),
  * snpEff (`java -Xmx4g`, register-iontorrent-data.py:338-352), pdftotext,
  * DICOM anonymization — always with a timeout and a `dryrun` testability
  * seam (`convert_raw(dryrun=True)`, etl_msconvert.py:208-209).
  *
  * Spark-native shape: `mapPartitions` over the file rows so one task =
  * one sequential batch of subprocess calls; task retry supplies
  * at-least-once, and idempotency probes (skip-if-output-exists, the
  * reference's own answer at etl_msconvert.py:845-856) make retries safe.
  * Never collect-and-loop on the driver.
  */
object External {
  /** Run `cmdFor(input)` for every row of `inputs`.
    *
    * @param dryrun      when true, no process is spawned; the planned
    *                    command is returned (the reference's own seam)
    * @param timeoutSec  per-invocation wall clock; timeout → exitCode 124
    */
  def execRows(inputs: Dataset[String], cmdFor: String => Seq[String],
               timeoutSec: Long = 7200L, dryrun: Boolean = false): Dataset[ExecResult] = {
    import inputs.sparkSession.implicits._
    inputs.mapPartitions { it =>
      it.map { input =>
        val cmd = cmdFor(input)
        if (dryrun) ExecResult(input, cmd, 0, "", "", dryrun = true)
        else runOne(input, cmd, timeoutSec)
      }
    }
  }

  private def runOne(input: String, cmd: Seq[String], timeoutSec: Long): ExecResult = {
    import java.util.concurrent.TimeUnit
    val pb = new ProcessBuilder(cmd: _*)
    val proc = pb.start()
    // Drain stdout/stderr on daemon threads: reading inline would block
    // past the timeout on a hung process, and a full stderr pipe buffer
    // would deadlock the child against an inline stdout read.
    @volatile var out = Array.emptyByteArray
    @volatile var err = Array.emptyByteArray
    def drainer(read: () => Array[Byte], set: Array[Byte] => Unit): Thread = {
      val t = new Thread(() => try set(read()) catch { case _: Exception => () })
      t.setDaemon(true); t.start(); t
    }
    val to = drainer(() => proc.getInputStream.readAllBytes(), out = _)
    val te = drainer(() => proc.getErrorStream.readAllBytes(), err = _)
    val finished = proc.waitFor(timeoutSec, TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly().waitFor()
    to.join(5000); te.join(5000)
    val code = if (!finished) 124 else proc.exitValue()
    ExecResult(input, cmd, code, new String(out), new String(err), dryrun = false)
  }

  /** Idempotency probe (X1's skip-if-converted): drop inputs whose
    * expected output row already exists. */
  def skipDone(inputs: DataFrame, done: DataFrame, key: Seq[String]): DataFrame =
    inputs.join(done.select(key.map(col): _*).distinct(), key, "left_anti")

  /** K6/X7 stdout glue: omero-bifrost answers `--to-xml` on stdout and
    * the reference digs the first child element's `id` attribute out
    * with ElementTree (`image_registration_process.py:69-74`). Same
    * extraction as a codegen'd xpath column over the harness's
    * `stdout` — no driver-side parse loop; -1 when no id element is
    * present (the reference's own sentinel). */
  def firstXmlId(stdout: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // xpath_string (not xpath_long): the numeric form maps "no match"
    // to 0, indistinguishable from a real id 0 — the empty string isn't
    val s = xpath_string(stdout, lit("string((//*[@id])[1]/@id)"))
    // try_cast + coalesce: a PRESENT but non-numeric id must fold to the
    // sentinel on ANY session — ANSI mode would make a plain cast THROW
    // on it, non-ANSI would emit NULL; neither is the contract
    when(s.isNull || s === "", lit(-1L))
      .otherwise(coalesce(s.try_cast("long"), lit(-1L)))
  }

  /** K7: bounded retry with backoff (sample-tracking updates retry 3×1s,
    * register-fastq-dropbox.py:133-145). For use inside foreachPartition
    * sinks; throws the last failure when attempts are exhausted. */
  def withRetry[T](attempts: Int = 3, backoffMs: Long = 1000L)(f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case e: Throwable =>
          last = e; i += 1
          if (i < attempts) Thread.sleep(backoffMs)
      }
    }
    throw last
  }
}
