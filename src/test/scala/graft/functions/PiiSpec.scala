package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks emails, IPv4s and phone shapes, in that order") {
    val df = Seq(
      "mail a.b+c@ex-1.example.org now",
      "hosts 10.0.0.1 and 192.168.254.3",
      "call 555-0199 or 555-0200",
      "mixed bob@corp.io at 172.16.0.9 tel 311-4159",
      "none of the above").toDF("t")
      .select(redactPii(col("t")).as("r"))
    assert(rows(df).flatten === Seq(
      "mail <EMAIL> now",
      "hosts <IP> and <IP>",
      "call <PHONE> or <PHONE>",
      "mixed <EMAIL> at <IP> tel <PHONE>",
      "none of the above"))
  }

  test("digits inside an already-masked wider match never re-count") {
    // '555-0123@x.io' is ONE email; the phone shape inside it must not
    // survive redaction or be counted once the email is masked.
    val df = Seq("send to 555-0123@x.io today").toDF("t")
      .select(
        redactPii(col("t")).as("r"),
        countMatches(regexp_replace(col("t"), EmailRe, "<EMAIL>"), PhoneRe)
          .as("n_phone_after"))
    assert(rows(df) === Seq(Seq("send to <EMAIL> today", 0L)))
  }

  test("countMatches counts occurrences and is 0 on empty/no-match") {
    val df = Seq("10.1.2.3 x 10.4.5.6", "", "no ips").toDF("t")
      .select(countMatches(col("t"), Ipv4Re).as("n"))
    assert(rows(df).flatten === Seq(2L, 0L, 0L))
  }

  test("null text propagates null through redaction") {
    val df = Seq[Option[String]](None).toDF("t")
      .select(redactPii(col("t")).as("r"))
    assert(rows(df) === Seq(Seq(null)))
  }
}
