package graft

import org.apache.spark.sql.functions._

/** Pins the built-in session_window boundary semantics that q_swindow's
  * oracle encodes: an event at EXACTLY last + gap still MERGES (the
  * merge edge is closed — diff > gap is the break condition), verified
  * here because the µs-granular gate data never produces an exact tie,
  * so only this spec holds the boundary. (The first draft assumed an
  * open edge; this suite is what caught it.) If a Spark upgrade ever
  * flips the semantics, this fails legibly before the gate row does.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def sessions(tsMicros: Seq[Long]): Seq[(Long, Long, Long)] = {
    val df = tsMicros.toDF("us")
      .select(lit(1L).as("user_id"), timestamp_micros(col("us")).as("t"))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("session_window.start")),
        unix_micros(col("session_window.end")), col("n"))
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
  }

  private val Gap = 30L * 60 * 1000000

  test("event exactly at last+gap merges (closed merge edge)") {
    assert(sessions(Seq(0L, Gap)) === Seq((0L, 2 * Gap, 2L)))
  }

  test("event one microsecond past last+gap opens a new session") {
    assert(sessions(Seq(0L, Gap + 1)) ===
      Seq((0L, Gap, 1L), (Gap + 1, Gap + 1 + Gap, 1L)))
  }

  test("event one microsecond inside the window merges and extends it") {
    assert(sessions(Seq(0L, Gap - 1)) === Seq((0L, Gap - 1 + Gap, 2L)))
  }

  test("chained sub-gap events form one session ending at last+gap") {
    val chain = Seq(0L, Gap / 2, Gap, 3 * Gap / 2)
    assert(sessions(chain) === Seq((0L, 3 * Gap / 2 + Gap, 4L)))
  }

  test("duplicate timestamps stay in one session") {
    assert(sessions(Seq(5L, 5L, 5L)) === Seq((5L, 5L + Gap, 3L)))
  }
}
