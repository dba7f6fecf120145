package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Microbench for the TopKPerKey whole-operator rewrite (BASELINE.md
  * "TopKPerKey whole-operator surface"): 50M range-generated rows,
  * 997 keys, k=10, at local[32].
  *
  * Env: GRAFT_TOPK_MODE = row_number | rank | dense_rank (the window
  * function under test), GRAFT_TOPK_STOCK = 1 to build the session
  * WITHOUT the extensions (stock WindowExec plan — the baseline),
  * SPARK_GRAFT_BENCH_REPS (min-of-reps, default 2). Prints one JSON
  * line: mode, stock, whether TopKPerKey planned, wall, output rows.
  * rank/dense_rank run over a deliberately tie-heavy value domain
  * (hash mod 1000) so boundary-tie retention is part of the measured
  * work; row_number orders by a unique (v, id) pair. */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val mode = sys.env.getOrElse("GRAFT_TOPK_MODE", "rank")
    val stock = sys.env.get("GRAFT_TOPK_STOCK").contains("1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val n = sys.env.getOrElse("GRAFT_TOPK_ROWS", "50000000").toLong
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark =
      (if (stock) builder
       else builder.config("spark.sql.extensions", "graft.GraftExtensions"))
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.range(n).select(
      pmod(col("id"), lit(997L)).as("g"),
      pmod(hash(col("id")), lit(1000L)).cast("long").as("v"),
      col("id"))
    val q = mode match {
      case "row_number" =>
        val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
        df.withColumn("r", row_number().over(w)).filter(col("r") <= 10)
      case "rank" =>
        val w = Window.partitionBy("g").orderBy(col("v"))
        df.withColumn("r", rank().over(w)).filter(col("r") <= 10)
      case "dense_rank" =>
        val w = Window.partitionBy("g").orderBy(col("v"))
        df.withColumn("r", dense_rank().over(w)).filter(col("r") <= 10)
    }
    val planned = q.queryExecution.executedPlan.toString.contains("TopKPerKey")
    // warm-up (class load + codegen), then min-of-reps
    q.queryExecution.toRdd.count()
    var rows = 0L
    val wall = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      rows = q.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(s"""{"mode":"$mode","stock":$stock,"topk_planned":$planned,""" +
      s""""wall_sec":${"%.3f".format(wall)},"rows":$rows,"n":$n}""")
    spark.stop()
  }
}
