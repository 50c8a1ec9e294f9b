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

object RowIndexStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RowIndexPlan(child, attr, order) =>
      RowIndexExec(planLater(child), attr, order) :: Nil
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
  }
}
