package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable

/** Streaming micro-batch cost decomposition (optimization guide §1;
  * r18 — VERDICT item #2): for each `q_stream*` / `q_tws*` cell, split
  * the wall into the engine's own per-batch phases from
  * `StreamingQueryProgress.durationMs` — `queryPlanning` (per-batch
  * IncrementalExecution planning), `walCommit` (offset log fsync),
  * `commitOffsets` (commit log fsync), `getBatch`/`latestOffset`
  * (source listing), `addBatch` (batch execution: jobs, state-store
  * load/commit, foreachBatch bodies) — plus the residual the progress
  * events don't cover (stream start/stop, memory-sink read-back,
  * fixture prep on first rep).
  *
  * Measurement-only: never invoked by the driver, changes no query.
  * Same env contract as [[Bench]] (SPARK_GRAFT_SF_DIR / _CPUS /
  * _STREAM_PARTITIONS / _BENCH_QUERIES).
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt.max(1)
    val names: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => SparkEntry.queries.keys.toSeq.sorted
        .filter(n => n.startsWith("q_stream") || n.startsWith("q_tws"))
    }
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(); ()
    }
    val shmCkpt = {
      val d = new java.io.File("/dev/shm")
      if (d.isDirectory && d.canWrite) {
        val p = new java.io.File(d, "graft_streamprofile_ckpt")
        if (p.exists()) wipe(p)
        Some(p.getAbsolutePath)
      } else None
    }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    // optional A/B hooks: state-store provider + any -D style conf via
    // SPARK_GRAFT_STREAM_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_STATESTORE_PROVIDER").foreach(p =>
      builder.config("spark.sql.streaming.stateStore.providerClass", p))
    sys.env.get("SPARK_GRAFT_STREAM_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    shmCkpt.foreach(p =>
      builder.config("spark.sql.streaming.checkpointLocation", p))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    // durationMs sums for every progress event since the last reset
    val phases = mutable.LinkedHashMap.empty[String, Long]
    var batches = 0
    val lock = new Object
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        lock.synchronized {
          batches += 1
          e.progress.durationMs.forEach { (k, v) =>
            phases(k) = phases.getOrElse(k, 0L) + v.longValue()
          }
        }
    }
    spark.streams.addListener(listener)

    println(f"${"cell"}%-20s ${"wall"}%7s ${"nb"}%3s ${"trigger"}%8s ${"addBatch"}%9s ${"plan"}%6s ${"walC"}%6s ${"commitO"}%8s ${"getB"}%6s ${"latest"}%7s ${"resid"}%7s")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT FOUND")
        case Some(fn) =>
          spark.conf.set("spark.sql.shuffle.partitions",
            if (name.startsWith("q_stream") || name.startsWith("q_tws") ||
              name == "q_windows" || name == "q_sessions") // same rule as Bench (r18)
              sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "4")
            else cpus)
          val rows = (1 to reps).map { _ =>
            shmCkpt.foreach(p => wipe(new java.io.File(p)))
            lock.synchronized { phases.clear(); batches = 0 }
            val t0 = System.nanoTime()
            try fn(spark, sfDir).queryExecution.toRdd.count()
            catch { case e: Throwable =>
              println(s"== $name FAILED: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(160)}")
            }
            val wall = (System.nanoTime() - t0) / 1e9
            Thread.sleep(200) // drain async listener events
            val (ph, nb) = lock.synchronized {
              (phases.toMap, batches)
            }
            spark.catalog.clearCache()
            System.gc()
            (wall, nb, ph)
          }
          val (wall, nb, ph) = rows.minBy(_._1)
          def g(k: String) = ph.getOrElse(k, 0L) / 1e3
          val resid = wall - g("triggerExecution")
          println(f"$name%-20s $wall%7.3f $nb%3d ${g("triggerExecution")}%8.3f ${g("addBatch")}%9.3f ${g("queryPlanning")}%6.3f ${g("walCommit")}%6.3f ${g("commitOffsets")}%8.3f ${g("getBatch")}%6.3f ${g("latestOffset")}%7.3f $resid%7.3f")
      }
    }
    spark.stop()
  }
}
