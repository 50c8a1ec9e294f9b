package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Distributed global row index — the whole-operator primitive behind the
  * reference's order-sensitive surface (`zipFrames`, `frameChunks`,
  * row slicing; Frames `src/Frames/Frame.hs:64-70`,
  * `src/Frames/InCore.hs:256-260`).
  *
  * Spark's built-in way to number rows globally is
  * `row_number() OVER (ORDER BY ...)` — a WindowExec with NO partition
  * key, which funnels the entire dataset through ONE task: the
  * scale-killer the reference's in-memory design never had to face. This
  * is the genuine "built-ins can't express it" case (builder brief path
  * (c)): a custom logical operator + strategy + physical operator.
  *
  * [[RowIndexExec]] keeps every partition parallel:
  *   1. requires `OrderedDistribution(order)` — Catalyst inserts a
  *      range-partitioned shuffle + per-partition sort (the same plan a
  *      global `ORDER BY` produces, parallel by construction);
  *   2. a lightweight counting job gets per-partition row counts
  *      (#partitions longs to the driver — not data);
  *   3. each partition adds `offset(pid) + local position` in a single
  *      streamed pass. The sort's shuffle files are reused by the second
  *      job (the DAG scheduler skips completed map stages), so the extra
  *      job costs one re-sort of each partition, never a re-shuffle —
  *      the same contract as `RDD.zipWithIndex`.
  *
  * Registered via [[GraftPlans.register]] (live session) or
  * `graft.functions.GraftExtensions` (`spark.sql.extensions`).
  */
final case class RowIndexPlan(
    child: LogicalPlan,
    indexAttr: AttributeReference,
    order: Seq[SortOrder]) extends UnaryNode {
  require(order.nonEmpty, "rowIndex needs an explicit ordering")
  override def output: Seq[Attribute] = child.output :+ indexAttr
  override def producedAttributes: AttributeSet = AttributeSet(indexAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): RowIndexPlan =
    copy(child = newChild)
}

final case class RowIndexExec(
    child: SparkPlan,
    indexAttr: AttributeReference,
    order: Seq[SortOrder]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ indexAttr
  override def producedAttributes: AttributeSet = AttributeSet(indexAttr)

  /** Range partitioning + in-partition sort: global order, parallel. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(order))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val input = child.execute()
    // counting job: per-partition sizes only — O(#partitions) to driver
    val counts = input
      .mapPartitions(it => Iterator.single(it.size), preservesPartitioning = true)
      .collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val types = output.map(_.dataType).toArray
    input.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(types)
      val joined = new JoinedRow
      val idxRow = new GenericInternalRow(1)
      var i = offsets(pid)
      it.map { row =>
        idxRow.update(0, i)
        i += 1
        proj(joined(row, idxRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): RowIndexExec =
    copy(child = newChild)
}

/** Distributed prefix sum (exclusive scan) under a total order — the
  * generalization of [[RowIndexPlan]] from counting to an arbitrary
  * long-valued weight: each row gets `sum(weight)` over all STRICTLY
  * preceding rows, plus its dense 0-based index. Same two-job shape as
  * the row index: range-partitioned parallel sort, one O(#partitions)
  * job collecting per-partition (count, weight-sum) partials, then a
  * streamed second pass adding partition offsets — the classic
  * distributed scan primitive (Blelloch 1990), never a single-task
  * global window.
  *
  * This is what makes order-dependent corpus ops cluster-scalable:
  * sequence packing (cumulative token counts -> context-window ids,
  * [[graft.operators.Packing]]), byte offsets in concatenated archives,
  * quota cuts over ranked corpora. */
final case class PrefixSumPlan(
    child: LogicalPlan,
    indexAttr: AttributeReference,
    sumAttr: AttributeReference,
    weight: org.apache.spark.sql.catalyst.expressions.Expression,
    order: Seq[SortOrder]) extends UnaryNode {
  require(order.nonEmpty, "prefixSum needs an explicit ordering")
  override def output: Seq[Attribute] = child.output :+ indexAttr :+ sumAttr
  override def producedAttributes: AttributeSet = AttributeSet(Seq(indexAttr, sumAttr))
  override protected def withNewChildInternal(newChild: LogicalPlan): PrefixSumPlan =
    copy(child = newChild)
}

final case class PrefixSumExec(
    child: SparkPlan,
    indexAttr: AttributeReference,
    sumAttr: AttributeReference,
    weight: org.apache.spark.sql.catalyst.expressions.Expression,
    order: Seq[SortOrder]) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ indexAttr :+ sumAttr
  override def producedAttributes: AttributeSet = AttributeSet(Seq(indexAttr, sumAttr))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(OrderedDistribution(order))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val input = child.execute()
    val boundW = org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(weight, child.output)
    // one pass per partition for (row count, weight sum) — O(#partitions)
    // longs to the driver, never data
    val partials = input.mapPartitions({ it =>
      var n = 0L; var s = 0L
      it.foreach { row =>
        n += 1
        val w = boundW.eval(row)
        if (w != null) s += w.asInstanceOf[Long]
      }
      Iterator.single((n, s))
    }, preservesPartitioning = true).collect()
    val idxOffsets = partials.map(_._1).scanLeft(0L)(_ + _)
    val sumOffsets = partials.map(_._2).scanLeft(0L)(_ + _)
    val types = output.map(_.dataType).toArray
    input.mapPartitionsWithIndex { (pid, it) =>
      val proj = UnsafeProjection.create(types)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(2)
      var i = idxOffsets(pid)
      var s = sumOffsets(pid)
      it.map { row =>
        extra.update(0, i)
        extra.update(1, s) // EXCLUSIVE prefix: offset before this row
        i += 1
        val w = boundW.eval(row)
        if (w != null) s += w.asInstanceOf[Long]
        proj(joined(row, extra))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PrefixSumExec =
    copy(child = newChild)
}

object RowIndexStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RowIndexPlan(child, attr, order) =>
      RowIndexExec(planLater(child), attr, order) :: Nil
    case PrefixSumPlan(child, idxAttr, sumAttr, weight, order) =>
      PrefixSumExec(planLater(child), idxAttr, sumAttr, weight, order) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule rewriting the global-window scale antipattern: a
  * `row_number() OVER (ORDER BY ... )` with NO partition key plans as a
  * WindowExec on a single partition — the whole dataset through one task.
  * This rule replaces exactly that shape (one window expression, empty
  * partition spec, row_number's default running row frame) with
  * [[RowIndexPlan]] + 1, which plans as the range-partitioned parallel
  * [[RowIndexExec]] — identical values, every partition parallel. Rows
  * tied on the order key may permute within the tie, exactly as the
  * single-task window's own sort may. Any other window (partitioned,
  * other functions, extra expressions) is left untouched. */
object GlobalRowNumberRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Cast, CurrentRow, Literal, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Window}
  import org.apache.spark.sql.types.IntegerType

  private val runningRowFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: Window
        if w.partitionSpec.isEmpty && w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case a @ Alias(
              WindowExpression(RowNumber(), WindowSpecDefinition(Seq(), order, frame)),
              _) if order.nonEmpty && frame == runningRowFrame =>
          val idx = AttributeReference("__row_index", LongType, nullable = false)()
          Project(
            w.child.output :+
              Alias(Cast(Add(idx, Literal(1L)), IntegerType), a.name)(
                a.exprId, a.qualifier),
            RowIndexPlan(w.child, idx, order))
        case _ => w
      }
  }
}

/** Companion rewrite for global running totals: a
  * `sum(expr) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING..CURRENT ROW)`
  * with NO partition key and a NON-NULLABLE long operand becomes
  * [[PrefixSumPlan]]'s exclusive prefix + the row's own weight — the
  * distributed scan instead of the single-task window. (Nullable
  * operands keep the built-in window: SQL's sum-over-frame skips nulls
  * and yields null for all-null prefixes, which the scan's plain
  * addition does not reproduce. RANGE frames — the default when only
  * ORDER BY is written — are also left alone: they sum ties together.) */
object GlobalRunningSumRule
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Add, Alias, CurrentRow, RowFrame, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Window}

  private val runningRowFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: Window
        if w.partitionSpec.isEmpty && w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case a @ Alias(
              WindowExpression(
                AggregateExpression(Sum(e, _), _, false, _, _),
                WindowSpecDefinition(Seq(), order, frame)),
              _)
            if order.nonEmpty && frame == runningRowFrame &&
              !e.nullable && e.dataType == LongType =>
          val idx = AttributeReference("__ps_idx", LongType, nullable = false)()
          val acc = AttributeReference("__ps_sum", LongType, nullable = false)()
          Project(
            w.child.output :+ Alias(Add(acc, e), a.name)(a.exprId, a.qualifier),
            PrefixSumPlan(w.child, idx, acc, e, order))
        case _ => w
      }
  }
}

object GraftPlans {
  /** Idempotently add graft's planner strategies + optimizer rules to a
    * live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(RowIndexStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RowIndexStrategy
    if (!spark.experimental.extraOptimizations.contains(GlobalRowNumberRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GlobalRowNumberRule
    if (!spark.experimental.extraOptimizations.contains(GlobalRunningSumRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GlobalRunningSumRule
  }
}
