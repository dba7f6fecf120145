package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The exact-moment stats operators must agree with the standard
  * definitions — checked against Spark's own corr() and a hand OLS on
  * real data (the gate only proves Spark and DuckDB agree with EACH
  * OTHER; this proves they agree with the textbook).
  */
class StatsMomentsSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("corrExact matches the built-in corr() on real integer data") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .as("x"),
        round(col("value") * 100).cast("long").as("y"))
    val ours = Stats.corrExact(ev, "event_type", col("x"), col("y"))
      .select("event_type", "r").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = ev.groupBy("event_type")
      .agg(corr(col("x").cast("double"), col("y").cast("double")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet === builtin.keySet)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 5e-5,
        s"$k: exact-moment $v vs built-in ${builtin(k)}")
    }
  }

  test("olsFit recovers a known line exactly") {
    // y = 3x + 7, no noise: slope/intercept must come back exact
    val df = (0L to 100L).map(x => ("g", x, 3 * x + 7))
      .toDF("g", "x", "y")
    val row = Stats.olsFit(df, "g", col("x"), col("y"))
      .select("slope", "intercept").head()
    assert(row.getDouble(0) === 3.0)
    assert(row.getDouble(1) === 7.0)
  }

  test("zero-variance group yields null, not NaN or crash") {
    val df = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L))
      .toDF("g", "x", "y")
    val c = Stats.corrExact(df, "g", col("x"), col("y")).select("r").head()
    assert(c.isNullAt(0))
    val o = Stats.olsFit(df, "g", col("x"), col("y")).select("slope").head()
    assert(o.isNullAt(0))
  }
}
