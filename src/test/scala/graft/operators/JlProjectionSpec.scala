package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The JL projection's useful property is not the row values the gate
  * hashes but the GEOMETRY they retain: nearest neighbors in the
  * original cosine space should still rank near the top in projected-L2
  * space. Measured on the real test embeddings, not assumed from the
  * lemma.
  */
class JlProjectionSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val raw: Map[Long, Array[Float]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private lazy val proj: Map[Long, Array[Long]] =
    Similarity.projectSigned(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "embedding", dIn = 64, dOut = 32, seed = "jl0")
      .select("vec_id", "proj")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def l2sq(a: Array[Long], b: Array[Long]): Long = {
    var acc = 0L; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  test("sign matrix is ±1, deterministic, and seed-sensitive") {
    val m = Similarity.jlSignMatrix(64, 16, "jl0")
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(v => v == 1L || v == -1L))
    assert(m.map(_.toSeq).toSeq ==
      Similarity.jlSignMatrix(64, 16, "jl0").map(_.toSeq).toSeq)
    assert(m.map(_.toSeq).toSeq !=
      Similarity.jlSignMatrix(64, 16, "other").map(_.toSeq).toSeq)
    // roughly balanced signs (sha parity): within 3σ of half
    val pos = m.flatten.count(_ == 1L)
    assert(math.abs(pos - 512) < 3 * 16, s"sign skew: $pos of 1024 positive")
  }

  test("64→32 projection keeps true top-10 inside the top-100 candidate set") {
    // The deployment shape is candidate generation + exact re-rank:
    // retrieve k' ≫ k in cheap projected space, re-rank candidates with
    // the full vectors. So the metric is "is the true top-10 captured
    // by the projected top-100", not final-rank agreement — on this
    // corpus's tight clusters, inter-neighbor margins are far below
    // the ε ≈ √(8·ln n / d) distortion, and final-rank recall@10 is
    // an honest 0.17 even at 32 dims (measured; recorded here so
    // nobody "fixes" the metric back).
    val ids = raw.keys.toSeq.sorted
    val queries = ids.take(20)
    val recalls = queries.map { q =>
      val trueTop = ids.filter(_ != q)
        .sortBy(o => (-cos(raw(q), raw(o)), o)).take(10).toSet
      val cands = ids.filter(_ != q)
        .sortBy(o => (l2sq(proj(q), proj(o)), o)).take(100).toSet
      trueTop.intersect(cands).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"mean candidate recall (top-10 in top-100) over ${queries.size} queries: $mean%.3f")
    // measured 0.71; floor pinned well under so it fails on geometry
    // loss (wrong signs, broken fixed-point), not sampling noise
    assert(mean >= 0.55, f"candidate recall degraded: $mean%.3f")
  }

  test("projected distances separate near pairs from far pairs") {
    val ids = raw.keys.toSeq.sorted
    val q = ids.head
    val byCos = ids.filter(_ != q).sortBy(o => -cos(raw(q), raw(o)))
    val near = byCos.take(10).map(o => l2sq(proj(q), proj(o)).toDouble)
    val far = byCos.takeRight(10).map(o => l2sq(proj(q), proj(o)).toDouble)
    assert(near.sum / near.size < far.sum / far.size,
      s"near mean ${near.sum / 10} !< far mean ${far.sum / 10}")
  }
}
