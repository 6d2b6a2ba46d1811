package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Top-k rows per group as a FIRST-CLASS operator (custom LogicalPlan +
  * SparkStrategy + SparkPlan — SURVEY.md §4.3 preference (c), used here
  * because the composed formulation has a real asymptotic cost the built-ins
  * can't avoid).
  *
  * The declarative shape — `row_number() OVER (PARTITION BY g ORDER BY o)`
  * then `WHERE rn <= k` — must SORT every group's full row set before
  * discarding all but k rows: O(n log n) comparisons and a full-partition
  * sort buffer (spill at scale), to keep k rows per key. This operator holds
  * one bounded k-element heap per group and streams the partition through
  * it: O(n log k), memory O(groups_per_partition × k), no sort, no spill.
  * At 100 TB with k = 2 that is the difference between sorting ~everything
  * and one comparison per discarded row.
  *
  * Same single hash-partition exchange on the group key as the window
  * (`requiredChildDistribution = ClusteredDistribution`), identical output
  * contract: rows of each group's top k under `order`, plus an `rk` rank
  * column (1-based). `order` must be a total order within groups for
  * deterministic results — the same requirement row_number has.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, child: LogicalPlan,
                        // constructor param, NOT a val: analyzer/optimizer
                        // copies of the node must keep the same exprId, or
                        // downstream references bind against a re-minted one
                        rankAttr: AttributeReference =
                          AttributeReference("rk", IntegerType, nullable = false)())
    extends UnaryNode {
  require(k >= 1, "topKPerGroup: k must be >= 1")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  /** `rk` is born here, not read from the child — without declaring it
    * produced, the node reports missing input and prints as invalid. */
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  /** One hash exchange on the group key — after it, every group is wholly
    * inside one partition, so the per-partition heaps see all of a group. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val kk = k
    val childOutput = child.output
    val outAttrs = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(orderE, childOutput)
      // Per group: a bounded max-heap (head = worst kept row). A new row
      // only enters by beating the current worst — one comparison per
      // discarded row, never a sort of the group. Rows are InternalRow, not
      // assumed Unsafe: a child that already satisfies the distribution
      // (single partition, pre-clustered) skips the exchange and may feed
      // generic rows.
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      val it = heaps.entrySet().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = current.hasNext || it.hasNext
        override def next(): InternalRow = {
          while (!current.hasNext) {
            // dequeueAll pops worst-first → reverse for rank order
            val rows = it.next().getValue.dequeueAll.reverse
            current = rows.iterator.zipWithIndex.map { case (r, i) =>
              rankRow.setInt(0, i + 1)
              outProj(joined(r, rankRow))
            }
          }
          current.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node onto its exec (planLater is
  * inherited from SparkStrategy). Registered per session via
  * [[TopKPerGroup.install]] (experimental.extraStrategies). */
object TopKPerGroupStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerGroup =>
      TopKPerGroupExec(t.groupExprs, t.order, t.k, t.rankAttr,
        planLater(t.child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  import org.apache.spark.sql.GraftSqlBridge

  /** Idempotently register the strategy on a live session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy

  /** Top-k rows per group with a 1-based `rk` rank column. `order` must
    * totally order rows within a group (include a tiebreak) — the same
    * determinism contract as row_number. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
                   orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val groupE = groupCols.map(GraftSqlBridge.convertedExpression)
    val orderE = orderCols.map(GraftSqlBridge.convertedExpression).map {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerGroup(groupE, orderE, k, df.queryExecution.analyzed))
  }
}
