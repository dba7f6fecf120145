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
    // one lock (the buffer's monitor) for listener-bus writes AND the
    // driver's per-rep clear/read — two different locks raced (advice r17)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        stages.synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized {
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

    // r18 (VERDICT r17 #8): per-ACTION plan evidence. The iterative
    // operators pin (localCheckpoint) every round, and each pin is an
    // action that reaches QueryExecutionListener — so the per-round
    // plan shape (exchange count, join strategy) that the final plan
    // dump cannot see (post-pin it is just an ExistingRDD scan) is
    // captured here round by round. SPARK_GRAFT_PLAN_ACTIONS=1 writes
    // one summary line per action (exchange/join counts parsed from the
    // formatted plan) to <plandir>/<cell>_actions_<tag>.txt, plus the
    // full formatted plan for the first SPARK_GRAFT_PLAN_ACTION_MAX
    // (default 0) actions. Measurement-only.
    val planActions = sys.env.get("SPARK_GRAFT_PLAN_ACTIONS").contains("1")
    val planActionMax =
      sys.env.getOrElse("SPARK_GRAFT_PLAN_ACTION_MAX", "0").toInt
    @volatile var currentCell = ""
    val actionIdx = new java.util.concurrent.atomic.AtomicInteger(0)
    if (planActions) spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        private def record(funcName: String,
                           qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
          val cell = currentCell
          if (cell.nonEmpty) planDir.foreach { pd =>
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pd))
            val k = actionIdx.incrementAndGet()
            val txt = qe.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            // count only the FINAL (post-AQE) plan: the formatted dump
            // appends the initial plan, whose pre-rewrite joins would
            // double-count and misreport the executed strategy
            val finalTxt = txt.split("== Initial Plan ==")(0)
            def n(tok: String) = tok.r.findAllIn(finalTxt).size
            val line = f"action $k%3d [$funcName%-18s] exchanges=${n("\\bExchange\\b")}%2d " +
              f"smj=${n("SortMergeJoin")}%2d shj=${n("ShuffledHashJoin")}%2d " +
              f"bhj=${n("BroadcastHashJoin")}%2d aqeRead=${n("AQEShuffleRead")}%2d\n"
            val p = java.nio.file.Paths.get(pd, s"${cell}_actions_$planTag.txt")
            java.nio.file.Files.write(p, line.getBytes("UTF-8"),
              java.nio.file.StandardOpenOption.CREATE,
              java.nio.file.StandardOpenOption.APPEND)
            if (k <= planActionMax)
              java.nio.file.Files.write(
                java.nio.file.Paths.get(pd, s"${cell}_action${k}_$planTag.txt"),
                txt.getBytes("UTF-8"))
          }
        }
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = record(funcName, qe)
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"== $name: NOT FOUND")
        case Some(fn) =>
          spark.conf.set("spark.sql.shuffle.partitions",
            if (name.startsWith("q_stream") || name.startsWith("q_tws") ||
              name == "q_windows" || name == "q_sessions") // same rule as Bench (r18)
              sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "4")
            else cpus)
          if (planActions) planDir.foreach { pd =>
            java.nio.file.Files.deleteIfExists(
              java.nio.file.Paths.get(pd, s"${name}_actions_$planTag.txt")); ()
          }
          val best = (1 to reps).map { rep =>
            // per-action dumps only for the first rep, so re-runs don't
            // re-append the same round lines
            currentCell = if (rep == 1) name else ""
            actionIdx.set(0)
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
