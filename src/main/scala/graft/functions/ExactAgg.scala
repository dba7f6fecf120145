package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact, order-independent monetary aggregation.
  *
  * Summing raw doubles is non-deterministic across partition orders (and
  * across engines), which breaks hash-compared results and makes reruns
  * unstable at scale. Scaling to integral fixed-point first makes the sum
  * exact and associative: identical on 32 local threads or 1000 executors,
  * and bit-identical to any other engine doing the same integer math.
  */
object ExactAgg {
  /** Sum with 4 fixed decimal places, returned as double. */
  def moneySum(c: Column, scale: Int = 10000): Column =
    sum(round(c * scale).cast("long")) / lit(scale.toDouble)

  /** Deterministic ratio of two integral aggregates, rounded. */
  def ratio(num: Column, den: Column, digits: Int = 4): Column =
    round(num.cast("double") / den.cast("double"), digits)
}
