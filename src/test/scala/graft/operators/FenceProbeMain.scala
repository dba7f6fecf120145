package graft.operators

import org.apache.spark.sql.SparkSession

/** SECOND-JVM probe for the writer-fencing rehearsal
  * ([[SnapshotTxnFenceSpec]]): a fresh driver JVM attempts a
  * transactional commit against an existing txn log — the exact
  * cross-process interleaving the fence exists to control. Prints one
  * token on stdout:
  *
  *   - `FENCED`    — the commit refused with the claimWriter message
  *                   (the non-holding-driver outcome);
  *   - `COMMITTED` — the commit landed (expected only in `claim` mode,
  *                   where the probe performs the explicit takeover
  *                   first).
  *
  * Any other failure escapes and fails the spawning spec loudly. */
object FenceProbeMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, txnRoot, tableDir) = args
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    try {
      if (mode == "claim") SnapshotTxn.claimWriter(spark, txnRoot)
      val t = SnapshotTxn.begin(spark, txnRoot)
      t.stageAppend(Seq((100L, "probe")).toDF("k", "v"), tableDir)
      t.commit()
      // scalastyle:off println — the token IS the IPC channel
      println("COMMITTED")
    } catch {
      case e: IllegalStateException
          if e.getMessage != null && e.getMessage.contains("claimWriter") =>
        println("FENCED")
    } finally spark.stop()
  }
}
