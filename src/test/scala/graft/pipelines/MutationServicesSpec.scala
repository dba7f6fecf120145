package graft.pipelines

import graft.SparkSpec
import graft.core.Errors
import org.apache.spark.sql.functions._

/** Parameter-map mutation services (register-sample-batch,
  * update-sample-metadata, set-experiment-for-samples): per-row
  * already-exists / not-found outcomes as data, partial-batch commit. */
class MutationServicesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyMap = map().cast("map<string,string>")

  private def existing = Seq(("S1", "E1", "Q_TEST_SAMPLE"))
    .toDF("code", "experiment", "sampleType")
    .withColumn("props", map(lit("Q_SECONDARY_NAME"), lit("old")))
  private def exps = Seq("E1", "E2").toDF("code")

  private def batch = Seq(
    ("S1", "E1", "Q_TEST_SAMPLE"), // collides
    ("S2", "E2", "Q_TEST_SAMPLE"), // clean create
    ("S3", "E9", "Q_TEST_SAMPLE")) // experiment missing
    .toDF("code", "experiment", "sampleType")
    .withColumn("props", emptyMap)

  test("registerSampleBatch strict: collision is an error row, rest commit") {
    val res = MutationServices.registerSampleBatch(existing, exps, batch,
      ignoreExisting = false)
    val st = res.status.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st == Map("S1" -> Errors.SampleAlreadyCreated,
      "S2" -> "created", "S3" -> Errors.ExperimentNotFound))
    // partial-batch commit: S2 landed, S3 did not, S1 kept its old row
    val codes = res.samples.collect().map(_.getAs[String]("code")).sorted
    assert(codes.toSeq == Seq("S1", "S2"))
    val s1 = res.samples.filter(col("code") === "S1").collect()(0)
    assert(s1.getAs[Map[String, String]]("props")("Q_SECONDARY_NAME") == "old")
  }

  test("registerSampleBatch IGNORE EXISTING: collision is skipped silently") {
    val res = MutationServices.registerSampleBatch(existing, exps, batch,
      ignoreExisting = true)
    val st = res.status.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st("S1") == "skipped" && st("S2") == "created")
    assert(res.samples.count() == 2)
  }

  test("registerSampleBatch: intra-batch duplicate codes error in BOTH modes") {
    val dup = Seq(("S7", "E1", "Q_TEST_SAMPLE"), ("S7", "E2", "Q_TEST_SAMPLE"),
      ("S8", "E1", "Q_TEST_SAMPLE"))
      .toDF("code", "experiment", "sampleType")
      .withColumn("props", emptyMap)
    for (ignore <- Seq(false, true)) {
      val res = MutationServices.registerSampleBatch(existing, exps, dup,
        ignoreExisting = ignore)
      val st = res.status.collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(st.count(_ == ("S7", Errors.SampleAlreadyCreated)) == 2)
      assert(st.contains(("S8", "created")))
      // neither S7 row lands: the catalog keeps its code-uniqueness
      assert(res.samples.filter(col("code") === "S7").count() == 0)
    }
  }

  test("updateSampleMetadata: new values win, untouched keys survive") {
    val updates = Seq(("S1", "Q_SECONDARY_NAME", "new"),
      ("S1", "Q_ADDITIONAL_INFO", "x"), ("S9", "Q_SECONDARY_NAME", "ghost"))
      .toDF("code", "prop", "value")
    val res = MutationServices.updateSampleMetadata(
      existing.withColumn("props",
        map(lit("Q_SECONDARY_NAME"), lit("old"), lit("Q_KEEP"), lit("k"))),
      updates)
    val p = res.samples.filter(col("code") === "S1").collect()(0)
      .getAs[Map[String, String]]("props")
    assert(p == Map("Q_SECONDARY_NAME" -> "new", "Q_ADDITIONAL_INFO" -> "x",
      "Q_KEEP" -> "k"))
    val st = res.status.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st == Map("S1" -> "updated", "S9" -> Errors.SampleNotFound))
  }

  test("updateSampleMetadata: duplicate rows never abort the batch") {
    // identical duplicates (a redelivered batch) collapse; CONFLICTING
    // values for one (code, prop) withhold that code's updates and
    // status it AMBIGUOUS_UPDATE — the naive map_from_entries would
    // throw 'Duplicate map key' and kill every row
    val updates = Seq(
      ("S1", "Q_SECONDARY_NAME", "x"), ("S1", "Q_SECONDARY_NAME", "x"),
      ("S2", "Q_SECONDARY_NAME", "a"), ("S2", "Q_SECONDARY_NAME", "b"),
      ("S3", "Q_ADDITIONAL_INFO", "ok"))
      .toDF("code", "prop", "value")
    val samples = Seq("S1", "S2", "S3").toDF("code")
      .withColumn("experiment", lit("E1"))
      .withColumn("sampleType", lit("Q_TEST_SAMPLE"))
      .withColumn("props", emptyMap)
    val res = MutationServices.updateSampleMetadata(samples, updates)
    val st = res.status.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st == Map("S1" -> "updated", "S2" -> Errors.AmbiguousUpdate,
      "S3" -> "updated"))
    val props = res.samples.collect()
      .map(r => r.getAs[String]("code") ->
        r.getAs[Map[String, String]]("props")).toMap
    assert(props("S1") == Map("Q_SECONDARY_NAME" -> "x"))
    assert(props("S2").isEmpty) // conflicted code left untouched
    assert(props("S3") == Map("Q_ADDITIONAL_INFO" -> "ok"))
  }

  test("updateSampleMetadata: NULL props map takes updates (not swallowed)") {
    val samples = Seq("S1").toDF("code")
      .withColumn("experiment", lit("E1"))
      .withColumn("sampleType", lit("Q_TEST_SAMPLE"))
      .withColumn("props", lit(null).cast("map<string,string>"))
    val res = MutationServices.updateSampleMetadata(samples,
      Seq(("S1", "Q_SECONDARY_NAME", "v")).toDF("code", "prop", "value"))
    val p = res.samples.collect()(0).getAs[Map[String, String]]("props")
    assert(p == Map("Q_SECONDARY_NAME" -> "v"))
  }

  test("setExperimentForSamples repoints only the named ids") {
    val two = existing.unionByName(
      Seq(("S2", "E1", "Q_TEST_SAMPLE")).toDF("code", "experiment", "sampleType")
        .withColumn("props", emptyMap))
    val res = MutationServices.setExperimentForSamples(two,
      exps.select(col("code")), Seq("S2"), "E2")
    val m = res.collect()
      .map(r => r.getAs[String]("code") -> r.getAs[String]("experiment")).toMap
    assert(m == Map("S1" -> "E1", "S2" -> "E2"))
    intercept[IllegalArgumentException] {
      MutationServices.setExperimentForSamples(two, exps, Seq("S1"), "E9")
    }
  }
}
