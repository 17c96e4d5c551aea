package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnShim
import scala.collection.mutable

/** Native per-group top-k — a whole custom operator (logical node +
  * planner strategy + physical exec), the (c) tier of SURVEY.md §7's
  * preference order, for the reference's hottest pattern (W2 "top-k
  * per group", `/root/reference/src/batch_analytics.py:47-49`).
  *
  * Why not the `row_number` window? The window operator SORTS every
  * group completely (shuffle + full per-partition sort) to keep k
  * rows. This operator keeps a bounded k-heap per group and runs in
  * TWO PHASES like partial aggregation: per-input-partition heaps
  * first (the data volume hitting the shuffle is ≤ k·groups per
  * partition, not the whole table), then per-group merge after the
  * exchange. No sort of the full input ever happens — the same reason
  * Catalyst plans global ORDER BY+LIMIT as TakeOrderedAndProject.
  */
case class TopKPerGroup(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

case class TopKPerGroupExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(grouping) :: Nil

  /** The FINAL phase streams over (group, order)-sorted input, so it
    * needs O(k) memory regardless of group count — the planner inserts
    * a SPILLABLE SortExec to satisfy this, which is what makes the
    * operator safe on high-cardinality groupings (a per-partition map
    * of heaps over millions of groups would OOM where the sort
    * spills). The partial phase stays heap-based and unordered. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(grouping.map(SortOrder(_, Ascending)) ++ order)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else grouping.map(SortOrder(_, Ascending)) ++ order

  override protected def doExecute(): RDD[InternalRow] = {
    val groupingExprs = grouping
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    if (partial) {
      // Bounded-memory guard: past this many distinct groups in one
      // input partition, new groups PASS THROUGH untrimmed (a correct
      // superset — the final phase trims exactly) instead of growing
      // the heap map without limit. Tracked groups keep filtering.
      val maxGroups = conf.getConfString(
        TopKPerGroupExec.maxGroupsKey, "65536").toInt
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
        val ord: Ordering[InternalRow] =
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .create(sortOrder, childOutput)
        // max-heap of the k best-so-far rows per group: head = the WORST
        // kept row; a new row replaces it iff it sorts strictly before.
        val heaps =
          mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        val passedThrough = iter.filter { row =>
          heaps.getOrElse(keyProj(row), null) match {
            case null =>
              if (heaps.size >= maxGroups) true // untracked: emit as-is
              else {
                val h = mutable.PriorityQueue.empty[InternalRow](ord)
                h.enqueue(row.copy())
                heaps.put(keyProj(row).copy(), h)
                false
              }
            case heap =>
              if (heap.size < limit) heap.enqueue(row.copy())
              else if (ord.compare(row, heap.head) < 0) {
                heap.dequeue()
                heap.enqueue(row.copy())
              }
              false
          }
        }
        // ++ is by-name: heaps drain only after the input is exhausted
        passedThrough ++ heaps.iterator.flatMap { case (_, heap) =>
          heap.dequeueAll.reverseIterator // rank order within the group
        }
      }, preservesPartitioning = true)
    } else {
      // Sorted streaming: input arrives (group, order)-sorted, so the
      // first k rows of each group run ARE its top-k.
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
        var currentKey: UnsafeRow = null
        var emitted = 0
        iter.filter { row =>
          val key = keyProj(row)
          if (currentKey == null || currentKey != key) {
            currentKey = key.copy()
            emitted = 0
          }
          emitted += 1
          emitted <= limit
        }
      }, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKPerGroupExec {
  /** Partial-phase heap-map cap (groups per input partition). */
  val maxGroupsKey = "spark.graft.topk.maxGroupsPerPartition"
}

/** Planner strategy: partial (pre-shuffle) + final (post-shuffle)
  * top-k, mirroring partial/final aggregation. */
object TopKStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val pre = TopKPerGroupExec(g, o, k, planLater(child), partial = true)
      TopKPerGroupExec(g, o, k, pre, partial = false) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Keep the first `k` rows of each group under `orderCols` (include a
    * unique tie-break column for deterministic results). Output schema
    * = input schema. Registers [[TopKStrategy]] with the session's
    * experimental strategies on first use (idempotent); production
    * wiring goes through `GraftExtensions`. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    // Extract fully-ANALYZED catalyst expressions by probing with
    // sortWithinPartitions/select and reading the resolved plan nodes —
    // converting Columns directly yields lazy wrappers that still
    // reference the (non-serializable) connect-side column node graph.
    val o = ColumnShim.logicalPlan(df.sortWithinPartitions(orderCols: _*)) match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.order
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    val g = ColumnShim.logicalPlan(df.select(groupCols: _*)) match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.map {
          case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
          case e => e
        }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    ColumnShim.ofRows(spark,
      TopKPerGroup(g, o, k, ColumnShim.logicalPlan(df)))
  }
}
