package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Top-k rows per group as a first-class operator — the brief's preference
  * path (c): custom `LogicalPlan` + `Strategy` + `SparkPlan`, used where
  * built-ins genuinely can't express the efficient plan.
  *
  * The built-in formulation (`row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k`) must SORT every group completely — at 100 TB that
  * is a full shuffle + full sort of the fact table to keep k rows per
  * group. This operator keeps a bounded heap per group instead: one
  * shuffle (clustered, no sort), O(n log k) comparisons, O(groups x k)
  * memory, and the sort-order generation is codegen'd
  * (`GenerateOrdering`).
  */
object TopKPerGroup {

  /** df restricted to the top `k` rows per `groupCols` group under
    * `sortOrder` (pass e.g. `col("qty").desc, col("id").asc`; make the
    * order total for deterministic results). Output columns = input
    * columns; rows within a group are emitted in sort order.
    */
  def apply(df: DataFrame, groupCols: Seq[String], sortOrder: Seq[Column], k: Int): DataFrame = {
    require(k > 0)
    val spark = df.sparkSession
    ensureStrategy(spark)
    // Resolve the caller's sort Columns through the analyzer itself: analyze
    // a Sort over the child and harvest its resolved SortOrders (Spark 4
    // Columns wrap unresolved ColumnNodes; hand-resolving them is fragile).
    val (orders, analyzedChild) = df.sort(sortOrder: _*).queryExecution.analyzed match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => throw new IllegalStateException(s"expected Sort, got $other")
    }
    val groupExprs = groupCols.map { c =>
      val name = c
      analyzedChild.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(s"unknown group column $name"))
    }
    Bridge.ofRows(spark, TopKPerGroupPlan(groupExprs, orders, k, analyzedChild))
  }

  // identity-keyed (sessions are long-lived objects; weak keys let closed
  // sessions be collected) — toString/hashCode keys can collide
  private val installed =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently add the planner strategy to the session (runtime path;
    * `GraftExtensions`-style injection works too for spark.sql.extensions).
    */
  def ensureStrategy(spark: SparkSession): Unit = installed.synchronized {
    if (installed.put(spark, java.lang.Boolean.TRUE) == null &&
      !spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
  }

  /** Idempotently add the [[RewriteWindowTopK]] optimizer rule (plus the
    * strategy it plans into) to a live session — the runtime counterpart
    * of `spark.sql.extensions=graft.GraftExtensions`.
    */
  def ensureRule(spark: SparkSession): Unit = {
    ensureStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteWindowTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteWindowTopK
    }
  }
}

/** Logical node: constructed with already-resolved child expressions, so
  * no custom analyzer rules are needed.
  */
case class TopKPerGroupPlan(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, s, k, child) =>
      TopKPerGroupExec(g, s, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical operator: requires clustering on the group keys (Spark inserts
  * the exchange), then a single streaming pass per partition maintaining a
  * size-k heap per group. No sort of the input ever happens.
  */
case class TopKPerGroupExec(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
    k: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val orderE = sortOrder
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ordering = GenerateOrdering.generate(orderE, childOutput)
      // max-heap by sort order: the worst retained row sits on top and is
      // evicted when a better one arrives
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      it.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, ordering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h =>
        val rows = new Array[InternalRow](h.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = h.poll(); i -= 1 } // heap drains worst-first
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
