package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differential test for the as-of join: both engine plans
  * (single-window and range-chunked) against an independent driver-side
  * reference implementation, over seeded-random corpora that include
  * hot keys, NULL carry values and keys with no right rows at all. */
class AsOfRandomSpec extends SparkSpec {
  import spark.implicits._

  private def referenceAsof(left: Seq[(Long, Long, Long)],
                            right: Seq[(Long, Long, Option[String])])
      : Set[(Long, Option[String], Option[Long])] = {
    val byKey = right.groupBy(_._1)
    left.map { case (id, k, t) =>
      byKey.getOrElse(k, Seq.empty).filter(_._2 <= t) match {
        case Seq() => (id, None, None)
        case rs =>
          val hit = rs.maxBy(_._2)
          (id, hit._3, Some(hit._2))
      }
    }.toSet
  }

  test("plain and chunked asof match a driver-side reference on random data") {
    val rnd = new scala.util.Random(20260813L)
    for (round <- 1 to 6) {
      val nKeys = 1 + rnd.nextInt(8)
      val nLeft = 50 + rnd.nextInt(200)
      // hot-key pressure: key 0 takes ~half the left rows
      val left = (0 until nLeft).map { i =>
        val k = if (rnd.nextBoolean()) 0L else rnd.nextInt(nKeys).toLong
        (i.toLong, k, rnd.nextInt(1000).toLong)
      }
      // unique (key, t) on the right (the operator contract); ~20% NULLs
      val right = (for {
        k <- 0L until nKeys.toLong
        t <- rnd.shuffle((0 until 1000).toList).take(rnd.nextInt(30))
      } yield (k, t.toLong,
        if (rnd.nextInt(5) == 0) None else Some(s"v${k}_$t"))).toSeq
      val expected = referenceAsof(left, right)

      val l = left.toDF("event_id", "k", "t")
      val r = right.toDF("k", "t", "v")
      val plain = AsOf.asofJoin(l, r, "k", "t", Seq("v"))
        .select("event_id", "v", "__rt")
        .as[(Long, Option[String], Option[Long])].collect().toSet
      assert(plain === expected, s"plain diverged in round $round")

      val chunk = 1L + rnd.nextInt(300)
      val chunked = AsOf.asofJoinChunked(l, r, "k", "t", Seq("v"), chunk)
        .select("event_id", "v", "__rt")
        .as[(Long, Option[String], Option[Long])].collect().toSet
      assert(chunked === expected, s"chunked(chunk=$chunk) diverged in round $round")
    }
  }
}
