package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components assign min reachable id, across chains") {
    // 1-2, 2-3 chain; 7-9 pair; 5 isolated (not in any pair → absent)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val r = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("an empty pair graph yields an empty assignment, not a crash") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(pairs).count() === 0)
  }

  test("a long chain converges (label must propagate multiple hops)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val r = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(r.values.toSet === Set(1L))
  }

  test("splitByComponent: near-dups share a split, singletons are their own rep") {
    val docs = (1L to 200L).toDF("id")
    // clusters {1,2,3} and {7,9}; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
    val r = Dedup.splitByComponent(docs, "id", comps)
      .as[(Long, Long, String)].collect()
    val byId = r.map(x => x._1 -> (x._2, x._3)).toMap
    assert(byId.keySet === (1L to 200L).toSet) // every doc assigned
    // cluster members share rep AND split
    assert(Set(byId(1L), byId(2L), byId(3L)).size === 1 && byId(1L)._1 === 1L)
    assert(byId(7L) === byId(9L) && byId(7L)._1 === 7L)
    // singleton reps are themselves
    assert(byId(50L)._1 === 50L)
    // all three splits realized at n=200 with 80/10/10 buckets
    assert(r.map(_._3).toSet === Set("train", "val", "test"))
    // deterministic
    val again = Dedup.splitByComponent(docs, "id", comps)
      .as[(Long, Long, String)].collect()
    assert(r.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("string doc ids work: convergence must not assume numeric labels") {
    // URL-ish ids in a 4-hop chain — the old sum(label) convergence
    // check returned NULL here and stopped after one hop.
    val pairs = Seq(("url/b", "url/c"), ("url/c", "url/d"),
      ("url/d", "url/e"), ("url/a", "url/b")).toDF("id_a", "id_b")
    val r = Dedup.connectedComponents(pairs).as[(String, String)].collect().toMap
    assert(r.values.toSet === Set("url/a"))
    assert(r.keySet === Set("url/a", "url/b", "url/c", "url/d", "url/e"))
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join, including hot keys") {
    val fact = (Seq.fill(500)("hot") ++ Seq("a", "b")).toDF("k")
    val dim = Seq(("hot", 1), ("a", 2), ("c", 3)).toDF("k", "v")
    val plain = fact.join(dim, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Skew.saltedJoin(fact, dim, "k").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(rows(plain.orderBy("k")) === rows(salted.orderBy("k")))
  }

  test("salt is deterministic: repeated runs and repartitioned input agree") {
    val fact = (1 to 300).map(i => (s"k${i % 7}", i)).toDF("k", "x")
    val dim = (0 until 7).map(i => (s"k$i", i * 10)).toDF("k", "v")
    val once = rows(Skew.saltedJoin(fact, dim, "k").orderBy("k", "x"))
    val again = rows(Skew.saltedJoin(fact, dim, "k").orderBy("k", "x"))
    // A different upstream partitioning is exactly what an AQE replan or
    // a task retry sees — row-hash salts must not re-roll.
    val repart = rows(Skew.saltedJoin(fact.repartition(13), dim, "k")
      .orderBy("k", "x"))
    assert(once === again)
    assert(once === repart)
  }

  test("rowId salting spreads identical duplicate rows; map columns tolerated") {
    // 400 byte-identical rows of the hot key: whole-row hashing parks
    // them all on one salt (documented limitation); hashing (key, rowId)
    // spreads them across all salts.
    val fact = (1 to 400).map(i => ("hot", i, Map("a" -> "b"))).toDF("k", "rid", "m")
    val dim = Seq(("hot", 1)).toDF("k", "v")
    // Map-typed columns are excluded from the row hash — no
    // AnalysisException (xxhash64 rejects MapType inputs).
    val wholeRow = Skew.saltedJoin(fact.select("k", "m"), dim, "k")
    assert(wholeRow.count() === 400)
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(col("k"), col("rid")), lit(8)))
      .select("__salt").distinct().count()
    assert(spread > 1) // rowId hash genuinely spreads
    val byId = Skew.saltedJoin(fact, dim, "k", rowId = Some("rid"))
    assert(byId.count() === 400) // equivalence holds under rowId salting
  }
}
