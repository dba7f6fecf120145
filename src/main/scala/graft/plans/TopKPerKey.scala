package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst surface for per-key top-k — SURVEY §7's
  * custom-operator tier (c): a logical node + optimizer rule + planner
  * strategy + physical operator, injected via `SparkSessionExtensions`.
  *
  * The declarative form every user writes —
  * {{{ row_number() OVER (PARTITION BY k ORDER BY o) <= K }}}
  * — plans as Window: ONE exchange, then a FULL SORT of every
  * partition's rows, then ranking and a filter that throws all but K
  * of them away. At 100 TB the sort is the bill: O(n log n) comparisons
  * and a spill surface proportional to the whole input, for an output
  * bounded by keys·K. [[TopKPerKeyExec]] replaces the sorted ranking
  * with per-key BOUNDED HEAPS in one streaming pass over the same
  * exchange: O(n log K) comparisons, memory bounded by
  * keys-in-partition·K rows, nothing spills that wasn't kept. The
  * rewrite is transparent: [[RewriteTopKWindow]] pattern-matches the
  * Filter-over-row_number-Window plan, so existing queries speed up
  * without knowing the operator exists (the [[RewriteDotProduct]]
  * philosophy at plan granularity).
  *
  * Semantics preserved exactly: same exchange keys, same ordering, the
  * emitted rank column reuses the Window output's attribute id, rows
  * per key come out rank-ascending. `row_number`'s tie behavior is
  * engine-arbitrary in BOTH forms (gate queries order by a unique key
  * set, as ever). Guards: only a single ranking window expression,
  * the standard running frame, a constant positive k, and only rank
  * conjuncts consumed — anything else keeps the stock plan.
  *
  * Three ranking functions are rewritten, with mode-specific retention
  * structures (`mode`):
  *  - `row_number` — per-key bounded heap, exactly k rows kept;
  *  - `rank` — ties at the boundary survive (`rank ≤ k` keeps every row
  *    ≤ the k-th smallest), so retention is an ordered group map pruned
  *    to the shortest downward-closed prefix holding ≥ k rows — memory
  *    is OUTPUT-bounded (k + boundary ties per key), the same rows
  *    WindowExec would emit;
  *  - `dense_rank` — the k smallest DISTINCT order keys with all their
  *    rows; memory output-bounded likewise.
  * Both tie modes stay exact under the partial/final split: a row kept
  * globally is kept by every partial (its strictly-smaller/distinct-
  * smaller witnesses are a subset in any partition slice).
  */
case class TopKPerKeyPlan(k: Int, mode: String, partitionSpec: Seq[Expression],
                          orderSpec: Seq[SortOrder], rnAttr: Attribute,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

/** Filter(rn ≤ k, Window(row_number()/rank()/dense_rank() …)) →
  * [[TopKPerKeyPlan]]. */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  /** The ranking functions the heap/group operator can stand in for. */
  private def modeOf(wf: Expression): Option[String] = wf match {
    case RowNumber() => Some("row_number")
    case Rank(_) => Some("rank")
    case DenseRank(_) => Some("dense_rank")
    case _ => None
  }

  /** k such that `cond` is exactly "rank ≤ k" over `rn`. */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _))
        if a.exprId == rn.exprId => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, _))
        if a.exprId == rn.exprId => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference)
        if a.exprId == rn.exprId => Some(k)
      case GreaterThan(Literal(k: Int, _), a: AttributeReference)
        if a.exprId == rn.exprId => Some(k - 1)
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(wf,
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          _)), _, _, child, _)) if order.nonEmpty && modeOf(wf).isDefined =>
      val rn = alias.toAttribute
      val conjuncts = splitConjuncts(cond)
      val bounds = conjuncts.flatMap(c => rankBound(c, rn))
      // residual conjuncts must not touch rn (IsNotNull(rn) is implied)
      val residual = conjuncts.filter {
        case c if rankBound(c, rn).isDefined => false
        case IsNotNull(a: AttributeReference) if a.exprId == rn.exprId => false
        case _ => true
      }
      if (bounds.size == 1 && bounds.head > 0 &&
          residual.forall(!_.references.contains(rn))) {
        val topk = TopKPerKeyPlan(bounds.head, modeOf(wf).get, part, order,
          rn, child)
        residual.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)
      } else f // decline: return the ORIGINAL node (fixed-point safety)
  }
}

/** Plans [[TopKPerKeyPlan]] as partial-over-final — the partial-
  * aggregation shape: each INPUT partition prunes to ≤ keys·k rows
  * map-side, so the exchange carries the pruned stream, not the
  * corpus. Top-k of a union is the top-k of per-part top-ks, so the
  * two-phase plan is exact. */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, mode, part, order, rn, child) =>
      TopKPerKeyExec(k, mode, part, order, Some(rn),
        TopKPerKeyExec(k, mode, part, order, None, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** One streaming pass with per-key bounded heaps: keeps each key's k
  * smallest rows under `orderSpec` (the rank-1..k prefix). Comparisons
  * O(n log k); retained memory keys-in-partition·k rows — never the
  * whole partition buffer WindowExec sorts and spills.
  *
  * Two modes, the partial-aggregation pattern: `rnAttr = None` is the
  * MAP-SIDE phase — no required distribution, emits pruned rows as-is,
  * its whole purpose is shrinking the exchange from O(input) to
  * O(parts·keys·k) rows (the shuffle-volume win that dominates at
  * cluster scale; the in-memory codegen'd sort actually beats a heap
  * on pure comparisons, measured and recorded in BASELINE.md).
  * `rnAttr = Some(rn)` is the FINAL phase over the clustered exchange,
  * emitting each key's survivors rank-ascending with the rank column
  * appended under the original Window output's attribute id. */
case class TopKPerKeyExec(k: Int, mode: String, partitionSpec: Seq[Expression],
                          orderSpec: Seq[SortOrder], rnAttr: Option[Attribute],
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ rnAttr.toSeq

  override def requiredChildDistribution: Seq[Distribution] =
    rnAttr match {
      case None => super.requiredChildDistribution // partial: anywhere
      case Some(_) if partitionSpec.isEmpty => AllTuples :: Nil
      case Some(_) => ClusteredDistribution(partitionSpec) :: Nil
    }

  /** row_number: per-key max-heap of exactly k rows. */
  private def executeHeaps(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val part = partitionSpec
    val order = orderSpec
    val out = output
    val withRank = rnAttr.isDefined
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(part, childOutput)
      val ord: Ordering[InternalRow] =
        RowOrdering.create(order, childOutput)
      // max-heap under ord → head is the WORST kept row; replace it
      // whenever a better (smaller) row arrives
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h); h
        }
        if (heap.size < kLocal) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap += row.copy(); ()
        }
      }
      if (!withRank) {
        heaps.iterator.flatMap(_._2.iterator)
      } else {
        val outProj = UnsafeProjection.create(out, out)
        val joined = new JoinedRow
        heaps.iterator.flatMap { case (_, heap) =>
          // dequeue order is worst-first; reverse for rank-ascending
          val ranked: Seq[InternalRow] = heap.dequeueAll.reverse
          ranked.iterator.zipWithIndex.map { case (r, i) =>
            outProj(joined(r, InternalRow(i + 1))).copy()
          }
        }
      }
    }, preservesPartitioning = true)
  }

  /** rank / dense_rank: per-key ordered map (order key → its rows),
    * pruned to the shortest downward-closed prefix that satisfies the
    * bound — `rank`: drop the largest group while the remaining groups
    * still hold ≥ k rows (the kept set is exactly "rows ≤ the k-th
    * smallest", boundary ties included); `dense_rank`: keep the k
    * smallest distinct keys. Retained memory = the operator's own
    * output for that key, never the partition buffer. */
  private def executeGroups(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val part = partitionSpec
    val order = orderSpec
    val out = output
    val withRank = rnAttr.isDefined
    val dense = mode == "dense_rank"
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(part, childOutput)
      val orderProj = UnsafeProjection.create(order.map(_.child), childOutput)
      val boundOrder = order.zipWithIndex.map { case (so, i) =>
        SortOrder(BoundReference(i, so.child.dataType, so.child.nullable),
          so.direction, so.nullOrdering, Seq.empty)
      }
      implicit val keyOrd: Ordering[UnsafeRow] =
        RowOrdering.create(boundOrder, Seq.empty)
          .asInstanceOf[Ordering[UnsafeRow]]
      final class Groups {
        val m = mutable.TreeMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
        var total = 0L
        def insert(okey: UnsafeRow, row: InternalRow): Unit = {
          val saturated =
            if (dense) m.size >= kLocal else total >= kLocal
          m.get(okey) match {
            case Some(buf) => buf += row.copy(); total += 1
            case None if saturated && keyOrd.compare(okey, m.lastKey) > 0 =>
              () // past the boundary: cannot enter the kept prefix
            case None =>
              m.put(okey.copy(),
                mutable.ArrayBuffer[InternalRow](row.copy()))
              total += 1
          }
          // prune the largest group while the prefix below it still
          // satisfies the bound
          var go = true
          while (go && m.size > 1) {
            val (lk, lbuf) = m.last
            val without = if (dense) m.size - 1 else total - lbuf.size
            if (without >= kLocal) { m.remove(lk); total -= lbuf.size }
            else go = false
          }
        }
      }
      val groups = mutable.LinkedHashMap.empty[UnsafeRow, Groups]
      iter.foreach { row =>
        val key = keyProj(row)
        val g = groups.get(key) match {
          case Some(g0) => g0
          case None =>
            val g0 = new Groups; groups.put(key.copy(), g0); g0
        }
        g.insert(orderProj(row), row)
      }
      if (!withRank) {
        groups.iterator.flatMap(_._2.m.valuesIterator.flatten)
      } else {
        val outProj = UnsafeProjection.create(out, out)
        val joined = new JoinedRow
        groups.iterator.flatMap { case (_, g) =>
          var cum = 0L
          var gi = 0
          g.m.iterator.flatMap { case (_, buf) =>
            val r = if (dense) gi + 1 else cum + 1
            gi += 1; cum += buf.size
            buf.iterator.map(row =>
              outProj(joined(row, InternalRow(r.toInt))).copy())
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def doExecute(): RDD[InternalRow] =
    if (mode == "row_number") executeHeaps() else executeGroups()

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPerKey {
  /** Imperative registration for sessions built without the extensions
    * conf (tests, shells). Idempotent. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategies)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategies
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteTopKWindow
    }
}
