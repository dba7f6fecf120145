package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Measurement harness (optimization guide §1): attributes each declared
  * query's wall time to planning vs execution and lists the stages that
  * carry the time, so optimization targets are chosen from numbers, not
  * guesses. Reads the same env contract as [[Bench]]; prints a per-query
  * breakdown and (with SPARK_GRAFT_PLANDIR set) writes
  * `explain("formatted")` to `<plandir>/<query>_<tag>.txt` — the plan
  * evidence committed under plans/r17/.
  *
  * Measurement-only: never invoked by the driver, changes no query.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planDir = sys.env.get("SPARK_GRAFT_PLANDIR")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLANTAG", "before")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "1").toInt.max(1)
    val names: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "64m"))
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCE", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup, same as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    case class StageRec(id: Int, name: String, durMs: Long, tasks: Int,
                        shufReadMb: Double, shufWriteMb: Double, inputMb: Double)
    val stages = mutable.ArrayBuffer.empty[StageRec]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val dur = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(0L)
          val tm = si.taskMetrics
          stages += StageRec(si.stageId, si.name.takeWhile(_ != '\n').take(80),
            dur, si.numTasks,
            tm.shuffleReadMetrics.totalBytesRead / 1e6,
            tm.shuffleWriteMetrics.bytesWritten / 1e6,
            tm.inputMetrics.bytesRead / 1e6)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT FOUND")
        case Some(fn) =>
          spark.conf.set("spark.sql.shuffle.partitions",
            if (name.startsWith("q_stream") || name.startsWith("q_tws"))
              sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "4")
            else cpus)
          val best = (1 to reps).map { rep =>
            stages.synchronized { stages.clear(); jobs = 0 }
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val qe = df.queryExecution
            qe.executedPlan // force analysis+optimization+physical planning
            val tPlan = (System.nanoTime() - t0) / 1e9
            val t1 = System.nanoTime()
            qe.toRdd.count()
            val tExec = (System.nanoTime() - t1) / 1e9
            if (rep == 1) planDir.foreach { pd =>
              val p = java.nio.file.Paths.get(pd, s"${name}_$planTag.txt")
              java.nio.file.Files.createDirectories(p.getParent)
              java.nio.file.Files.write(p,
                qe.explainString(org.apache.spark.sql.execution.FormattedMode)
                  .getBytes("UTF-8"))
            }
            spark.catalog.clearCache()
            System.gc()
            (tPlan, tExec)
          }.minBy(t => t._1 + t._2)
          val (tPlan, tExec) = best
          // brief pause so async listener events drain before reading
          Thread.sleep(300)
          val recs = stages.synchronized { stages.toList }
          val stageSum = recs.map(_.durMs).sum / 1e3
          println(f"== $name%-22s total=${tPlan + tExec}%7.3f plan=$tPlan%6.3f exec=$tExec%7.3f jobs=$jobs%3d stages=${recs.size}%3d stageSum=$stageSum%7.3f")
          recs.sortBy(-_.durMs).take(12).foreach { r =>
            println(f"     stage ${r.id}%4d ${r.durMs}%6d ms tasks=${r.tasks}%3d in=${r.inputMb}%8.2fMB sr=${r.shufReadMb}%8.2fMB sw=${r.shufWriteMb}%8.2fMB  ${r.name}")
          }
      }
    }
    spark.stop()
  }
}
