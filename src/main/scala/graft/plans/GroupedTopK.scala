package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-group top-k as a first-class operator.
  *
  * Spark expresses "top k rows per group" as
  * `row_number().over(Window...)` + filter, which sorts EVERY group's
  * full row set (WindowExec sorts each partition). This operator keeps
  * a bounded k-element heap per group instead: O(n log k) per
  * partition, memory bounded by k·groups-per-partition, no full sort.
  * The reference exercises the global form of this as its partial-TopN
  * cascade (results/q003/workers-1/explain.txt:21-31); this is the
  * grouped generalization, built the Catalyst-native way: logical node
  * → planner strategy → physical exec, registered via
  * SparkSessionExtensions (GraftExtensions).
  *
  * Output = child columns + an appended `rank` (1-based within group,
  * ordered by `order`). Callers must include a deterministic tiebreak
  * in `order` for stable results. */
case class GroupedTopK(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: AttributeReference)
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

case class GroupedTopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    rankAttr: AttributeReference)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  // co-locate each group in one partition; single-partition child is fine
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable expression trees; build projections and
    // the generated ordering executor-side, inside the closure
    val childOutput = child.output
    val groups = groupExprs
    val sortOrder = order
    val outAttrs = output
    val kk = k
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groups, childOutput)
      val rowOrdering = RowOrdering.create(sortOrder, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      // per group: bounded "worst-first" heap of the current best k rows
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          rowOrdering.compare(b, a)
      }
      iter.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) {
          heap.add(row.copy())
        } else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { heap =>
        val rows = new Array[InternalRow](heap.size())
        var i = heap.size() - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // worst out first
        rows.iterator.zipWithIndex.map { case (r, idx) =>
          rankRow.setInt(0, idx + 1)
          outProj(joined(r, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(g, o, k, child, rank) =>
      GroupedTopKExec(g, o, k, planLater(child), rank) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {
  /** Top `k` rows per `groupCols` ordered by `orderCols`
    * (name → descending?; include a unique tiebreak for determinism);
    * appends `rank` (1-based). Columns are resolved by name against the
    * analyzed child plan — Spark 4 `Column`s are lazy nodes, not
    * Catalyst expressions. */
  def topK(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"GroupedTopK.topK: k must be positive, got $k")
    require(groupCols.nonEmpty, "GroupedTopK.topK: at least one group column required")
    require(orderCols.nonEmpty, "GroupedTopK.topK: at least one order column required")
    val spark = df.sparkSession
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute = plan.output
      .find(a => spark.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrders = orderCols.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    val rank = AttributeReference("rank", IntegerType, nullable = false)()
    GraftBridge.ofRows(spark,
      GroupedTopK(groupCols.map(attr(_)), sortOrders, k, plan, rank))
  }
}
