package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator Catalyst extension: top-k rows per group via bounded
  * heaps — logical node + planner strategy + physical operator, registered
  * through `SparkSessionExtensions.injectPlannerStrategy` (graft.expr
  * .GraftExtensions).
  *
  * Why a custom operator (SURVEY §7.4 level c): Spark expresses per-group
  * top-k as `row_number().over(partitionBy(g).orderBy(o)) <= k`, which
  * plans a WindowExec — a FULL SORT of every group (O(n log n) per
  * partition, spill-prone) just to discard all but k rows. This operator
  * keeps a k-bounded heap per group (O(n log k), memory bounded by
  * k·|groups-per-partition|) and — the scale win — prunes map-side BEFORE
  * the shuffle: the partial stage emits at most k rows per (input
  * partition, group), so the exchange moves ≤ k·P rows per group instead
  * of the whole fact table. Top-k of a union of per-partition top-ks is
  * the global top-k (monotone), so the two-stage plan is exact.
  *
  * Ties: callers must pass a TOTAL order (e.g. price DESC, id ASC) or the
  * surviving rows at the k boundary are unspecified — same contract as the
  * reference window pattern.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "top-k needs k > 0")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans the logical node as partial(map-side) -> final; EnsureRequirements
  * inserts the hash exchange between them via the final stage's
  * ClusteredDistribution requirement. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val ge = groupExprs
    val so = order
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(ge, childOutput)
      // "best" row = first under the requested sort order
      val betterFirst = RowOrdering.create(so, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // max-heap: worst of the kept k at the head, evicted on a better row
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          betterFirst.compare(b, a)
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (betterFirst.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** DataFrame-level entry point. Columns are resolved BY NAME against the
  * child's analyzed output — Spark 4's Column objects carry lazy
  * ColumnNode wrappers that the analyzer only converts inside its own
  * operators, so a custom logical node must be built from already-resolved
  * attributes. */
object TopK {
  /** Top `k` rows of `df` per distinct value of `groupCols`, ordered by
    * `orderCols` as (name, ascending) pairs — pass a total order for
    * deterministic results. */
  def perKey(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = Bridge.logicalPlan(df)
    def attr(n: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    Bridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(attr), order, k, child))
  }
}
