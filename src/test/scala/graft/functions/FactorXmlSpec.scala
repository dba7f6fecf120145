package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FactorXmlSpec extends SparkSpec {
  import spark.implicits._

  private val decl =
    "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"

  test("parses the reference template shape: repeated qcategorical") {
    // exactly etl_msconvert.py:528's template with two factors filled in
    val xml = decl + " <qproperties> <qfactors> " +
      "<qcategorical label=\"technical_replicate\" value=\"2\"/> " +
      "<qcategorical label=\"workflow_type\" value=\"ligandomics\"/> " +
      "</qfactors> </qproperties>"
    val out = Seq(xml).toDF("x")
      .select(explode(FactorXml.parseFactors(col("x"))).as("f"))
      .select("f.ftype", "f.label", "f.value", "f.unit")
    assert(rows(out) === Seq(
      Seq("categorical", "technical_replicate", "2", null),
      Seq("categorical", "workflow_type", "ligandomics", null)))
  }

  test("continuous factors carry a unit; kinds concatenate cat-then-cont") {
    val xml = decl + " <qproperties> <qfactors> " +
      "<qcontinous label=\"dose\" value=\"5\" unit=\"mg\"/> " +
      "<qcategorical label=\"arm\" value=\"treated\"/> " +
      "</qfactors> </qproperties>"
    val out = Seq(xml).toDF("x")
      .select(explode(FactorXml.parseFactors(col("x"))).as("f"))
      .select("f.ftype", "f.label", "f.value", "f.unit")
    assert(rows(out) === Seq(
      Seq("categorical", "arm", "treated", null),
      Seq("continuous", "dose", "5", "mg")))
  }

  test("empty qfactors and factor-less docs give an empty array, not NULL") {
    val out = Seq(
      decl + " <qproperties> <qfactors> </qfactors> </qproperties>",
      decl + " <qproperties> </qproperties>")
      .toDF("x").select(size(FactorXml.parseFactors(col("x"))).as("n"))
    assert(rows(out) === Seq(Seq(0), Seq(0)))
  }

  test("malformed and NULL input degrade to an empty array, never throw") {
    val out = Seq(Some("<qproperties><qfactors><qcategorical label=\"x\""), // truncated
        Some("not xml at all"), None)
      .toDF("x").select(size(FactorXml.parseFactors(col("x"))).as("n"))
    assert(rows(out) === Seq(Seq(0), Seq(0), Seq(0)))
  }

  test("canonicalizeUrl: case, ports, tracking params, fragments") {
    val cases = Seq(
      "HTTP://Example.COM:80/P/x?utm_source=a&id=5#frag" ->
        "http://example.com/P/x?id=5",
      "https://a.b:443/x?id=1&gclid=zz" -> "https://a.b/x?id=1",
      "http://h/p?utm_campaign=c" -> "http://h/p",
      "http://h:8080/p?id=2" -> "http://h:8080/p?id=2", // non-default port kept
      "https://H.I/p" -> "https://h.i/p",
      // look-alike param names must survive untouched (boundary regression)
      "http://h/p?my_utm_source=5&id=2" -> "http://h/p?my_utm_source=5&id=2",
      "http://h/p?a=1&xgclid=keep" -> "http://h/p?a=1&xgclid=keep",
      // adjacent tracking params both drop, separators tidy up
      "http://h/p?utm_a=1&utm_b=2&id=3" -> "http://h/p?id=3",
      "http://h/p?a=1&gclid=x&b=2" -> "http://h/p?a=1&b=2",
      // cased variants canonicalize to the same key (advice r7): the
      // NAME match is case-blind, param VALUES keep their case
      "http://h/p?UTM_SOURCE=a&id=5" -> "http://h/p?id=5",
      "http://h/p?id=1&Gclid=zz" -> "http://h/p?id=1",
      "http://h/p?id=1&FBCLID=Qq" -> "http://h/p?id=1",
      "http://h/p?id=9&other=KeepCase" -> "http://h/p?id=9&other=KeepCase",
      // digit/underscore suffixes strip whole, no '_id=' residue
      "http://h/p?utm_source_id=7&id=4" -> "http://h/p?id=4",
      "http://h/p?utm_term2=x&id=6" -> "http://h/p?id=6")
    val out = cases.map(_._1).toDF("u")
      .select(TextFunctions.canonicalizeUrl(col("u")).as("c"))
    assert(rows(out).flatten === cases.map(_._2))
  }

  test("hasFactor filters rows by a factor value") {
    val mk = (v: String) => decl + " <qproperties> <qfactors> " +
      s"""<qcategorical label="arm" value="$v"/> </qfactors> </qproperties>"""
    val df = Seq(1 -> mk("treated"), 2 -> mk("control"), 3 -> mk("treated"))
      .toDF("id", "x")
    val hits = df.filter(FactorXml.hasFactor(col("x"), "arm", "treated"))
      .select("id").as[Int].collect().toSeq
    assert(hits === Seq(1, 3))
  }
}
