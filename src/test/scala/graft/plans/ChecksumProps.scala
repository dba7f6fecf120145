package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the checksum kernel — pure JVM, no Spark session,
  * so they exercise thousands of cases cheaply. */
object ChecksumProps extends Properties("ChecksumUtil") {

  private val asciiCode: Gen[String] = for {
    n <- Gen.choose(0, 12)
    cs <- Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar))
  } yield cs.mkString

  /** Independent reference implementation (straight from the survey's
    * algorithm description, register-iontorrent-data.py:79-94). */
  private def reference(s: String): String = {
    val v = s.take(9).zipWithIndex.map { case (c, i) => c.toInt * (i + 1) }.sum % 34
    (if (v < 10) ('0' + v).toChar else ('A' + v - 10).toChar).toString
  }

  property("matches the reference algorithm on arbitrary ASCII") =
    Prop.forAll(asciiCode) { s =>
      ChecksumUtil.compute(UTF8String.fromString(s)).toString == reference(s)
    }

  property("output is always one char in [0-9A-X]") =
    Prop.forAll(asciiCode) { s =>
      val c = ChecksumUtil.compute(UTF8String.fromString(s)).toString
      c.length == 1 && (('0' to '9') ++ ('A' to 'X')).contains(c.head)
    }

  property("only the first 9 chars matter") =
    Prop.forAll(asciiCode, asciiCode) { (a, b) =>
      val base = (a + "XXXXXXXXX").take(9)
      ChecksumUtil.compute(UTF8String.fromString(base + a)).toString ==
        ChecksumUtil.compute(UTF8String.fromString(base + b)).toString
    }
}
