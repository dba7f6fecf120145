package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive small-range + algebraic checks of the letter-skip barcode
  * sequence (register-nmr.py:48-57 semantics, overflow fixed): the map
  * idx → code must be injective, regex-valid, checksum-valid, and must
  * never use Y or Z — over WHOLE letter blocks, not just the spec's
  * spot values. Runs the column expression in one Spark pass. */
class SeqBarcodeProps extends SparkSpec {
  import spark.implicits._

  test("blocks A/B and the X tail: injective, valid, Y/Z-free") {
    // 1..2200 covers all of letter A, all of B, and the start of C;
    // the X tail covers the capacity edge
    val idxs = ((1L to 2200L) ++
      (PrefixRegistryPipeline.SeqCapacity - 50L to
        PrefixRegistryPipeline.SeqCapacity + 5L)).toDF("idx")
    val rows = idxs.select(col("idx"),
        PrefixRegistryPipeline.seqBarcode(lit("QTEST"), col("idx")).as("c"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val inRange = rows.filter(_._1 <= PrefixRegistryPipeline.SeqCapacity)
    val overflow = rows.filter(_._1 > PrefixRegistryPipeline.SeqCapacity)
    // overflow is NULL, never a malformed code
    assert(overflow.forall(_._2 == null))
    // in range: all defined, all distinct (injective)
    assert(inRange.forall(_._2 != null))
    assert(inRange.map(_._2).distinct.length == inRange.length)
    // shape + letter domain
    inRange.foreach { case (_, c) =>
      assert(c.matches("QTEST[0-9]{3}[A-X][0-9A-X]"), c)
    }
    // checksum validity via the engine's own validator, one pass
    val n = inRange.length
    val valid = inRange.map(_._2).toSeq.toDF("c")
      .filter(graft.functions.Barcode.isValid(col("c"))).count()
    assert(valid == n)
    // number rolls exactly at the block edge
    val m = inRange.toMap
    assert(m(999L).startsWith("QTEST999A"))
    assert(m(1000L).startsWith("QTEST001B"))
    assert(m(1998L).startsWith("QTEST999B"))
    assert(m(1999L).startsWith("QTEST001C"))
  }
}
