package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** matchToPanel (vcf2xml.py:179-197) against an independent Scala model
  * over randomized (observed, panel) inputs — the set semantics the big
  * q_cxx gate exercises on one seed shape, checked here across shapes:
  * marker dominance, overlap sorting, presence marker, off-panel drop. */
class CentraXXProps extends SparkSpec {
  import spark.implicits._

  private def model(obs: Seq[String], panel: Option[Seq[String]]): Option[Seq[String]] =
    if (obs.contains("VARIANTABSENT")) Some(Seq("VARIANTABSENT"))
    else panel.map(p => obs.distinct.filter(p.contains).sorted :+ "VARIANTPRESENT")

  test("matchToPanel agrees with the reference model on random inputs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("V600E", "V600K", "G12D", "G13C", "L858R", "T790M",
      "R175H", "A100T", "P250S", "VARIANTABSENT")
    val cases = (1 to 300).map { i =>
      val obs = Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).distinct
      val panel = if (rnd.nextBoolean())
        Some(Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size - 1))).distinct)
      else None
      (i, obs, panel)
    }
    val df = cases.map { case (i, o, p) => (i, o, p.orNull) }
      .toDF("i", "obs", "panel")
      .select(col("i"),
        CentraXX.matchToPanel(col("obs"), col("panel")).as("refs"))
    val got = df.collect()
      .map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1).toSeq)).toMap
    cases.foreach { case (i, o, p) =>
      val want = model(o, p).orNull
      assert(got(i) == want, s"case $i: obs=$o panel=$p got=${got(i)} want=$want")
    }
  }
}
