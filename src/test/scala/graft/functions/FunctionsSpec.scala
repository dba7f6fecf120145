package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BarcodeSpec extends SparkSpec {
  import spark.implicits._

  test("checksum char matches the reference weighted-sum algorithm") {
    val df = Seq("QABCD001A", "QTEST005X", "QQQQQ999Z").toDF("code")
      .select(Barcode.checksumChar(col("code")).as("c"))
    assert(rows(df).flatten === Seq("0", "M", "Q"))
  }

  test("isValid accepts correct codes and rejects shape/checksum errors") {
    val df = Seq(
      "QABCD001A0" -> true,  // valid
      "QTEST005XM" -> true,  // valid
      "QABCD001A1" -> false, // wrong checksum
      "QAB0001A0"  -> false, // too short
      "XABCD001A0" -> false  // no leading Q
    ).toDF("code", "expect")
    val got = df.select(col("expect"), Barcode.isValid(col("code")).as("got"))
    assert(got.filter(col("expect") =!= col("got")).count() === 0)
  }

  test("extract finds the first barcode; distinctMatches counts distinct") {
    val df = Seq("run_QABCD001A0_QABCD001A0.fastq", "x_QABCD001A0_QTEST005XM")
      .toDF("name")
      .select(Barcode.extract(col("name")).as("b"),
        Barcode.distinctMatches(col("name")).as("n"))
    assert(rows(df) === Seq(Seq("QABCD001A0", 1), Seq("QABCD001A0", 2)))
  }

  test("make builds a valid barcode from project + counter + class") {
    val df = Seq(("QABCD", 1, "A")).toDF("p", "n", "c")
      .select(Barcode.make(col("p"), col("n"), col("c")).as("code"))
      .select(col("code"), Barcode.isValid(col("code")).as("ok"))
    assert(rows(df) === Seq(Seq("QABCD001A0", true)))
  }
}

class DateNormSpec extends SparkSpec {
  import spark.implicits._

  test("all seven reference date shapes normalize to the same ISO date") {
    val inputs = Seq(
      "2016-06-02T09:10:11Z", "2016-06-02T09:10:11.123456", "2016-06-02",
      "02.06.2016", "02-06-2016", "20160602", "160602")
    val df = inputs.toDF("s").select(DateNorm.normalize(col("s")).cast("string").as("d"))
    assert(rows(df).flatten.toSet === Set("2016-06-02"))
  }

  test("two-digit years follow the strptime 69-pivot") {
    val df = Seq("690101", "680101").toDF("s")
      .select(DateNorm.normalize(col("s")).cast("string").as("d"))
    assert(rows(df).flatten === Seq("1969-01-01", "2068-01-01"))
  }

  test("garbage yields null, not an exception") {
    val df = Seq("not a date", "").toDF("s")
      .select(DateNorm.normalize(col("s")).as("d"))
    assert(rows(df).flatten === Seq(null, null))
  }

  test("round-trip property: 200 random dates x all 7 formats") {
    import java.time.LocalDate
    import java.time.format.DateTimeFormatter
    val fmts = Seq("yyyy-MM-dd'T'HH:mm:ss'Z'", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
      "yyyy-MM-dd", "dd.MM.yyyy", "dd-MM-yyyy", "yyyyMMdd", "yyMMdd")
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(200) {
      // yyMMdd can only represent 1969-2068 under the strptime pivot
      val d = LocalDate.of(1969 + rnd.nextInt(100), 1 + rnd.nextInt(12), 1 + rnd.nextInt(28))
      val f = fmts(rnd.nextInt(fmts.length))
      val rendered = DateTimeFormatter.ofPattern(f)
        .format(d.atTime(rnd.nextInt(24), rnd.nextInt(60), rnd.nextInt(60), rnd.nextInt(1000000) * 1000))
      (rendered, d.toString)
    }
    val df = cases.toDF("s", "expect")
      .select(col("expect"), DateNorm.normalize(col("s")).cast("string").as("got"))
    val bad = df.filter(col("expect") =!= col("got") || col("got").isNull)
    assert(bad.count() === 0, bad.collect().take(5).mkString(";"))
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import TextFunctions._

  test("tokens handles empty, padded and multi-space text") {
    val df = Seq("", "  ", " a  b ", "one").toDF("t")
      .select(size(tokens(col("t"))).as("n"))
    assert(rows(df).flatten === Seq(0, 0, 2, 1))
  }

  test("wordNgrams emits size-n shingles and collapses short docs") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(wordNgrams(tokens(col("t")), 3).as("g"))
    assert(rows(df).map(_.head) === Seq(Seq("a b c", "b c d"), Seq("a b")))
  }

  test("subtokens splits letter runs, digit runs and punctuation") {
    val df = Seq("ab12-cd!").toDF("t").select(subtokens(col("t")).as("s"))
    assert(rows(df).map(_.head) === Seq(Seq("ab", "12", "-", "cd", "!")))
  }

  test("shaHash32 is stable and 32-bit") {
    val df = Seq("x", "x", "y").toDF("t").select(shaHash32(col("t")).as("h"))
    val hs = rows(df).flatten.map(_.asInstanceOf[Long])
    assert(hs(0) === hs(1))
    assert(hs(0) !== hs(2))
    assert(hs.forall(h => h >= 0 && h < (1L << 32)))
  }
}

class AminoAcidSpec extends SparkSpec {
  import spark.implicits._

  test("protein-change strings translate 3-letter to 1-letter") {
    val df = Seq("p.Lys41Asn", "p.Ala123Thr", "p.Trp26Ter").toDF("p")
      .select(AminoAcid.normalizeProteinChange(col("p")).as("o"))
    assert(rows(df).flatten === Seq("K41N", "A123T", "W26*"))
  }

  test("mutationParts splits ref/pos/alt") {
    val df = Seq("K41N").toDF("m")
      .select(AminoAcid.mutationParts(col("m")).as("p"))
      .select("p.ref", "p.pos", "p.alt")
    assert(rows(df) === Seq(Seq("K", "41", "N")))
  }
}

class ExactAggSpec extends SparkSpec {
  import spark.implicits._

  test("moneySum is exact under any partitioning") {
    val vals = Seq.fill(1000)(0.01) ++ Seq.fill(10)(123.45)
    val one = vals.toDF("v").repartition(1)
      .agg(ExactAgg.moneySum(col("v"), 100).as("s"))
    val many = vals.toDF("v").repartition(7)
      .agg(ExactAgg.moneySum(col("v"), 100).as("s"))
    assert(rows(one) === rows(many))
    assert(rows(one).flatten === Seq(1244.5))
  }
}
