package graft.pipelines

import graft.SparkSpec
import graft.operators.Lineage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** register-ivac-lvl (reporting-plugins/register-ivac-lvl/script.py):
  * 4-tier chain registration — entity → biological sample → test sample
  * → run — composed from Catalog.appendNew + the edges table, plus a
  * Lineage walk over the created chain and the idempotent re-run. */
class IvacChainSpec extends SparkSpec {
  import spark.implicits._

  private def emptyMap = map().cast("map<string,string>")

  private def levels: (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val l1 = Seq(("P1_INFO", "P1_DSGN", "P1_ENT", "patient one"))
      .toDF("details_code", "exp_code", "sample_code", "sec")
      .withColumn("sample_props",
        map(lit("Q_NCBI_ORGANISM"), lit("9606"),
          lit("Q_SECONDARY_NAME"), col("sec"))).drop("sec")
    val l2 = Seq(("P1_EXT1", "P1_BIO1", "P1_ENT"), ("P1_EXT2", "P1_BIO2", "P1_ENT"))
      .toDF("exp_code", "sample_code", "parent")
    val l3 = Seq(("P1_PREP1", "P1_TST1", "P1_BIO1", "DNA"),
      ("P1_PREP2", "P1_TST2", "P1_BIO1", "RNA"))
      .toDF("exp_code", "sample_code", "parent", "t")
      .withColumn("sample_props", map(lit("Q_SAMPLE_TYPE"), col("t"))).drop("t")
    val l4 = Seq(("P1_MEAS1", "P1_RUN1", "P1_TST1"))
      .toDF("exp_code", "sample_code", "parent")
    (l1, l2, l3, l4)
  }

  private def noSamples = Seq.empty[(String, String, String)]
    .toDF("code", "sampleType", "experiment")
    .withColumn("props", emptyMap)
  private def noExps = Seq.empty[(String, String)].toDF("code", "expType")
    .withColumn("props", emptyMap)
  private def noEdges = Seq.empty[(String, String)].toDF("parent", "child")

  test("register creates all four tiers with experiments and edges") {
    val (l1, l2, l3, l4) = levels
    val res = IvacChainPipeline.register(noSamples, noExps, noEdges,
      l1, l2, l3, l4)
    val types = res.samples.collect()
      .map(r => r.getAs[String]("code") -> r.getAs[String]("sampleType")).toMap
    assert(types == Map(
      "P1_ENT" -> "Q_BIOLOGICAL_ENTITY",
      "P1_BIO1" -> "Q_BIOLOGICAL_SAMPLE", "P1_BIO2" -> "Q_BIOLOGICAL_SAMPLE",
      "P1_TST1" -> "Q_TEST_SAMPLE", "P1_TST2" -> "Q_TEST_SAMPLE",
      "P1_RUN1" -> "Q_NGS_SINGLE_SAMPLE_RUN"))
    val expTypes = res.experiments.collect()
      .map(r => r.getAs[String]("code") -> r.getAs[String]("expType")).toMap
    assert(expTypes("P1_INFO") == "Q_PROJECT_DETAILS")
    assert(expTypes("P1_DSGN") == "Q_EXPERIMENTAL_DESIGN")
    assert(expTypes("P1_MEAS1") == "Q_NGS_MEASUREMENT")
    assert(res.edges.count() == 5)
    // entity props landed
    val ent = res.samples.filter(col("code") === "P1_ENT").collect()(0)
    assert(ent.getAs[Map[String, String]]("props")("Q_NCBI_ORGANISM") == "9606")
  }

  test("a parameter row repeated WITHIN one submission creates once") {
    val (l1, l2, l3, l4) = levels
    // duplicate level-2 row in the same batch: appendNew only guards
    // against the existing catalog, so the in-batch dedup must catch it
    val res = IvacChainPipeline.register(noSamples, noExps, noEdges,
      l1, l2.unionByName(l2.limit(1)), l3, l4)
    assert(res.samples.filter(col("code") === "P1_BIO1").count() == 1)
    assert(res.edges.filter(col("child") === "P1_BIO1").count() == 1)
    assert(res.edges.count() == 5)
  }

  test("lineage walks the chain top-to-bottom; re-run is a no-op") {
    val (l1, l2, l3, l4) = levels
    val res = IvacChainPipeline.register(noSamples, noExps, noEdges,
      l1, l2, l3, l4)
    // J8 down-walk from the entity reaches every created sample
    val desc = Lineage.descendants(res.edges, Seq("P1_ENT").toDF("code"))
      .select("descendant").collect().map(_.getString(0)).toSet
    assert(Set("P1_BIO1", "P1_BIO2", "P1_TST1", "P1_TST2", "P1_RUN1")
      .subsetOf(desc))
    // idempotence: registering the same levels over the produced state
    // creates nothing new
    val again = IvacChainPipeline.register(res.samples, res.experiments,
      res.edges, l1, l2, l3, l4)
    assert(again.samples.count() == res.samples.count())
    assert(again.experiments.count() == res.experiments.count())
    assert(again.edges.count() == res.edges.count())
  }
}
