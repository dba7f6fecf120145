package graft.pipelines

import graft.SparkSpec
import graft.core.Errors
import org.apache.spark.sql.functions._

/** Experiment-side parameter-map services (register-exp,
  * update-experiment-metadata, update-project-metadata,
  * registerUponWorkflow): batch create with date normalization and
  * Proteases gap numbering, props updates, count-based workflow
  * registration. */
class ExperimentServicesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyMap = map().cast("map<string,string>")
  private def noExps = Seq.empty[(String, String)].toDF("code", "expType")
    .withColumn("props", emptyMap)
  private def noMats = Seq.empty[(String, String)].toDF("code", "matType")
    .withColumn("props", emptyMap)

  test("registerExperiments: dup skips, collisions error, dates normalize") {
    val existing = Seq(("E2", "Q_X")).toDF("code", "expType")
      .withColumn("props", emptyMap)
    val batch = Seq(
      (0L, "E1", "Q_X", Map("Q_MS_DATE" -> "05-03-2023", "Q_NOTE" -> "raw")),
      (1L, "E2", "Q_X", Map.empty[String, String]), // catalog collision
      (2L, "E3", "Q_X", Map.empty[String, String]),
      (3L, "E3", "Q_X", Map.empty[String, String])) // in-batch dup (later)
      .toDF("idx", "code", "expType", "props")
      .withColumn("enzymes", lit(null).cast("array<string>"))
    val res = ExperimentServices.registerExperiments(existing, noMats,
      batch, "P1")
    val st = res.status.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(st == Set(("E1", "created"),
      ("E2", Errors.ExperimentAlreadyCreated),
      ("E3", "created"), ("E3", "skipped")))
    val e1 = res.experiments.filter(col("code") === "E1").collect()(0)
      .getAs[Map[String, String]]("props")
    // dd-MM-yyyy → midnight timestamp string; non-dates untouched
    assert(e1 == Map("Q_MS_DATE" -> "2023-03-05 00:00:00", "Q_NOTE" -> "raw"))
    assert(res.experiments.count() == 3) // E2 kept its seed row only
  }

  test("Proteases numbering probes gaps in idx order; digestion points at it") {
    val mats = Seq(("P1_Proteases", "Q_PROTEASE_PROTOCOL"),
      ("P1_Proteases2", "Q_PROTEASE_PROTOCOL"),
      ("P1_Other", "Q_SOMETHING")) // different type: not a taken number
      .toDF("code", "matType").withColumn("props", emptyMap)
    val batch = Seq(
      (0L, "E1", "Q_X", Seq("Trypsin", "LysC")),
      (1L, "E2", "Q_X", Seq("GluC")))
      .toDF("idx", "code", "expType", "enzymes")
      .withColumn("props", map(lit("Q_PROTEASE_DIGESTION"), lit("stale")))
    val res = ExperimentServices.registerExperiments(noExps, mats,
      batch, "P1")
    // bare and 2 taken → E1 (idx 0) gets 1, E2 gets 3
    val dig = res.experiments.collect().map(r => r.getAs[String]("code") ->
      r.getAs[Map[String, String]]("props")("Q_PROTEASE_DIGESTION")).toMap
    assert(dig == Map("E1" -> "P1_Proteases1", "E2" -> "P1_Proteases3"))
    val m1 = res.materials.filter(col("code") === "P1_Proteases1")
      .collect()(0).getAs[Map[String, String]]("props")
    assert(m1 == Map("Q_PROTEASE_1" -> "Trypsin", "Q_PROTEASE_2" -> "LysC"))
    assert(res.materials.count() == 5)
  }

  test("updateExperimentMetadata shares the sample twin's core") {
    val exps = Seq(("E1", "Q_X")).toDF("code", "expType")
      .withColumn("props", map(lit("A"), lit("old"), lit("B"), lit("keep")))
    val res = ExperimentServices.updateExperimentMetadata(exps,
      Seq(("E1", "A", "new"), ("E9", "A", "x")).toDF("code", "prop", "value"))
    val p = res.samples.collect()(0).getAs[Map[String, String]]("props")
    assert(p == Map("A" -> "new", "B" -> "keep"))
    val st = res.status.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st == Map("E1" -> "updated", "E9" -> Errors.SampleNotFound))
  }

  test("updateProjectDescription: named id only; absent id refuses") {
    val projects = Seq(("P1", "d1"), ("P2", "d2"))
      .toDF("code", "description")
    val out = ExperimentServices
      .updateProjectDescription(projects, "P2", "new desc")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("P1" -> "d1", "P2" -> "new desc"))
    intercept[IllegalArgumentException] {
      ExperimentServices.updateProjectDescription(projects, "P9", "x")
    }
    ()
  }

  test("workflowRegistration: count numbering, sample pair, verbatim edge") {
    val exps = Seq(("QWF1", "Q_MS"), ("QWF2", "Q_MS"))
      .toDF("code", "expType").withColumn("props", emptyMap)
    val noSamples = Seq.empty[(String, String, String)]
      .toDF("code", "sampleType", "experiment").withColumn("props", emptyMap)
    val noEdges = Seq.empty[(String, String)].toDF("parent", "child")
    val res = ExperimentServices.workflowRegistration(exps, noSamples,
      noEdges, "QWF", "Q_MS", "RUN7", "Q_MS_RUN",
      expProps = Map("Q_STATUS" -> "STARTED"))
    // count-based: 2 existing → QWF3 (the reference's len()+1 rule)
    val e = res.experiments.filter(col("code") === "QWF3").collect()
    assert(e.length == 1 &&
      e(0).getAs[Map[String, String]]("props")("Q_STATUS") == "STARTED")
    val s = res.samples.collect().map(r =>
      r.getAs[String]("code") -> r.getAs[String]("experiment")).toMap
    assert(s == Map("MSQCRUN7" -> "QWF3", "MSQCRUN7T" -> "QWF3"))
    // the reference builds the parent id WITHOUT the MSQC prefix
    assert(res.edges.collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq == Seq(("RUN7T", "MSQCRUN7")))
  }
}
