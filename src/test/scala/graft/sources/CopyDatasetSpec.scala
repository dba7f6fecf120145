package graft.sources

import graft.SparkSpec

/** K9 dataset copy + ACL grant (copy-dataset/script.py:12-35): the copy
  * is a distributed per-partition Hadoop FS copy over the enumerated
  * tree; the setfacl grant goes through the exec harness's dryrun seam
  * (the OS call itself needs a root-capable target FS, absent here). */
class CopyDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def mkTree(): (String, String) = {
    import java.nio.file.{Files => JF, Paths}
    val src = JF.createTempDirectory("graft-copysrc")
    JF.createDirectories(src.resolve("sub"))
    JF.write(src.resolve("a.dat"), "payload-a".getBytes("UTF-8"))
    JF.write(src.resolve("sub/b.dat"), "payload-bb".getBytes("UTF-8"))
    val dst = JF.createTempDirectory("graft-copydst").resolve("out")
    (src.toString, dst.toString)
  }

  test("copyDataset preserves tree structure and payload, one row per file") {
    import java.nio.file.{Files => JF, Paths}
    val (src, dst) = mkTree()
    val res = Sinks.copyDataset(spark, src, dst).collect().sortBy(_.src)
    assert(res.length === 2 && res.forall(_.ok))
    assert(res.map(_.bytes).sum === 19)
    assert(new String(JF.readAllBytes(Paths.get(dst, "a.dat"))) === "payload-a")
    assert(new String(JF.readAllBytes(Paths.get(dst, "sub/b.dat"))) === "payload-bb")
    // Re-copy is idempotent (overwrite), so task retries are safe.
    assert(Sinks.copyDataset(spark, src, dst).collect().forall(_.ok))
  }

  test("aclGrant renders the reference's setfacl command per dataset root") {
    val r = Sinks.aclGrant(Seq("/dest/ds1").toDS(), "user1", dryrun = true)
      .collect()
    assert(r.length === 1 && r.head.dryrun && r.head.exitCode === 0)
    assert(r.head.cmd === Seq("setfacl", "-m", "u:user1:r-x", "/dest/ds1"))
  }
}
