package graft

import org.apache.spark.sql.functions._

/** Randomized differential for the built-in session_window against a
  * driver-side gaps-and-islands fold — many small random timelines
  * with deliberate exact-gap collisions (ts drawn from multiples of
  * gap/4, so boundary ties actually occur, unlike the µs gate data).
  */
class SessionWindowRandomSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 1000L // µs

  /** Reference: closed merge edge — break only when diff > gap. */
  private def reference(ts: Seq[Long]): Seq[(Long, Long, Long)] = {
    val sorted = ts.sorted
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var start = sorted.head
    var last = sorted.head
    var n = 0L
    for (t <- sorted) {
      if (t - last > Gap) {
        out += ((start, last + Gap, n))
        start = t; n = 0
      }
      last = t; n += 1
    }
    out += ((start, last + Gap, n))
    out.toSeq
  }

  test("random timelines with exact-gap ties match the islands fold") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 25) {
      val n = 1 + rnd.nextInt(40)
      // multiples of gap/4 → ties AND exact-gap diffs are common
      val ts = Seq.fill(n)(rnd.nextInt(40).toLong * (Gap / 4))
      val got = ts.toDF("us")
        .select(lit(1L).as("u"), timestamp_micros(col("us")).as("t"))
        .groupBy(col("u"), session_window(col("t"), "1000 microseconds"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("session_window.start")),
          unix_micros(col("session_window.end")), col("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got === reference(ts), s"round $round, ts=${ts.sorted}")
    }
  }
}
