package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join (scale toolbox).
  *
  * AQE's skew-join split handles most runtime skew; salting is the
  * explicit fallback when one key dominates so heavily that even split
  * shuffle blocks overwhelm a task (the classic hot-customer /
  * null-key case at 100 TB). Fact rows get a deterministic salt in
  * [0, n) — a hash of the whole row, never `rand()`: a per-partition-
  * seeded random re-rolls under AQE replans or task retries with a
  * different upstream partitioning, silently dropping/duplicating
  * matches. The dimension side is replicated n ways, so the hot key
  * spreads over n tasks. Equivalence to the plain join is exact.
  */
object Skew {
  /** Known limitation: fully-IDENTICAL duplicate fact rows hash to the
    * same salt, so a hot key whose rows are byte-for-byte copies is not
    * spread. Pass `rowId` (any unique column — offset, file+pos, uuid)
    * to salt by hash(key, rowId) instead, which spreads even identical
    * payloads. Map-typed columns are excluded from the row hash
    * (xxhash64 rejects MapType; the remaining columns still give a
    * deterministic, well-mixed salt). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 8, rowId: Option[String] = None): DataFrame = {
    val hashable = rowId match {
      case Some(id) => Seq(key, id)
      case None =>
        val mapCols = fact.schema.fields
          .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
          .map(_.name).toSet
        fact.columns.toSeq.filterNot(mapCols)
    }
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(hashable.map(col): _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
