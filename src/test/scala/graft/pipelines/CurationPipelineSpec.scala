package graft.pipelines

import graft.SparkSpec

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"))

  private val enBase = "the quick brown fox jumps over the lazy dog " +
    "and then the fox runs off into the woods to find a den of foxes"

  private val docs = Seq(
    (1L, enBase),                       // keep (canonical of 1,2,5)
    (2L, enBase + " tonight"),          // near-dup of 1 → dropped
    (3L, "der hund und die katze und das pferd laufen durch der wald " +
      "und die wiese und das feld und der bach und die sonne scheint"), // de → dropped
    (4L, "too short"),                  // quality gate → dropped
    (5L, enBase)                        // exact dup of 1 → dropped
  ).toDF("doc_id", "text")

  test("curation keeps quality English canonicals only") {
    val kept = CurationPipeline.curate(docs, "doc_id", "text", stops,
        minTokens = 5, keepLang = "en", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("annotate emits token counts and per-language scores") {
    val a = CurationPipeline.annotate(docs, "doc_id", "text", stops)
    assert(a.columns.toSet === Set("doc_id", "text", "n_tokens",
      "score_en", "score_de", "score_fr", "lang_pred"))
    val byId = a.select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(byId(1L) === "en" && byId(3L) === "de")
  }
}
