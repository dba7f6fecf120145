package graft.exec

import graft.SparkSpec

class ExternalSpec extends SparkSpec {
  import spark.implicits._

  test("dryrun plans commands without spawning processes") {
    val r = External.execRows(Seq("a.raw", "b.raw").toDS(),
      f => Seq("msconvert", f, "--mzML"), dryrun = true).collect()
    assert(r.forall(_.dryrun) && r.forall(_.exitCode == 0))
    assert(r.map(_.cmd).toSet === Set(
      Seq("msconvert", "a.raw", "--mzML"), Seq("msconvert", "b.raw", "--mzML")))
  }

  test("real invocation captures exit code and stdout") {
    val r = External.execRows(Seq("hello").toDS(),
      f => Seq("echo", f), timeoutSec = 30).collect()
    assert(r.head.exitCode === 0)
    assert(r.head.stdout.trim === "hello")
  }

  test("nonzero exit codes are reported, not thrown") {
    val r = External.execRows(Seq("x").toDS(),
      _ => Seq("false"), timeoutSec = 30).collect()
    assert(r.head.exitCode === 1)
  }

  test("a hung process is killed at the timeout with exit code 124") {
    val t0 = System.nanoTime()
    val r = External.execRows(Seq("x").toDS(),
      _ => Seq("sleep", "60"), timeoutSec = 2).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.head.exitCode === 124)
    assert(secs < 30, s"timeout did not fire promptly ($secs s)")
  }

  test("firstXmlId digs the tool's dataset id out of XML stdout (K6 glue)") {
    import org.apache.spark.sql.functions._
    // a REAL subprocess emitting the omero-bifrost --to-xml shape: the
    // reference takes the first child element's id attribute
    val xml = "<omero><dataset id=\"4711\" name=\"QABCD\"/></omero>"
    val r = External.execRows(Seq("QABCD").toDS(), _ => Seq("echo", xml),
        timeoutSec = 30)
      .withColumn("ds_id", External.firstXmlId(col("stdout")))
    assert(rows(r.select("ds_id")).flatten === Seq(4711L))
    // no id element → the reference's -1 sentinel
    val none = External.execRows(Seq("x").toDS(), _ => Seq("echo", "<omero/>"),
        timeoutSec = 30)
      .withColumn("ds_id", External.firstXmlId(col("stdout")))
    assert(rows(none.select("ds_id")).flatten === Seq(-1L))
    // present but NON-NUMERIC id → sentinel too, never NULL
    val junk = External.execRows(Seq("x").toDS(),
        _ => Seq("echo", "<o><d id=\"abc-123\"/></o>"), timeoutSec = 30)
      .withColumn("ds_id", External.firstXmlId(col("stdout")))
    assert(rows(junk.select("ds_id")).flatten === Seq(-1L))
  }

  test("skipDone drops inputs whose output already exists") {
    val inputs = Seq("a", "b", "c").toDF("path")
    val done = Seq("b").toDF("path")
    val r = External.skipDone(inputs, done, Seq("path"))
    assert(rows(r).flatten.toSet === Set("a", "c"))
  }
}
