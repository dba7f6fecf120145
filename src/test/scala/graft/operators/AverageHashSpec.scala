package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal.averageHash: the integer cross-multiplied mean test and
  * the signed 64-bit pack (bit 63 = Long.MinValue weight). End-to-end
  * banding + oracle parity crosses the q_phash gate. */
class AverageHashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(cells: Seq[Long]): Long =
    Seq(Tuple1(cells)).toDF("g")
      .select(Multimodal.averageHash(col("g")).as("h"))
      .collect()(0).getLong(0)

  test("uniform grid has no bright cells: hash 0") {
    assert(hashOf(Seq.fill(64)(7L)) == 0L)
  }

  test("single bright cell sets exactly its bit — including bit 63") {
    val base = Seq.fill(64)(10L)
    assert(hashOf(base.updated(5, 255L)) == (1L << 5))
    assert(hashOf(base.updated(63, 255L)) == Long.MinValue)
  }

  test("mean test is strict: cells exactly AT the mean stay dark") {
    // half 0s, half 2s: mean 1, the 2-cells are bright
    val g = Seq.tabulate(64)(i => if (i < 32) 0L else 2L)
    val h = hashOf(g)
    assert(java.lang.Long.bitCount(h) == 32)
    assert((h & 1L) == 0L && (h >>> 32) == 0xFFFFFFFFL)
  }

  test("small perturbations move few bits (the near-dup property)") {
    val rnd = new scala.util.Random(3)
    val base = Seq.fill(64)(rnd.nextInt(256).toLong)
    val twin = base.zipWithIndex.map { case (v, i) =>
      if (i % 29 == 0) (v + 200) % 256 else v
    }
    val d = java.lang.Long.bitCount(hashOf(base) ^ hashOf(twin))
    assert(d <= 10, s"twin hamming $d")
  }
}
