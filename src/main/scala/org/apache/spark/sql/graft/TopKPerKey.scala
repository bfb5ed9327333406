package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-group top-k as a first-class operator — logical node, strategy, and
  * a two-phase physical plan — replacing the
  * `row_number().over(partitionBy(keys).orderBy(o)) <= k` idiom whose
  * physical form sorts ENTIRE partitions and shuffles every row to rank a
  * handful. Rung (d) of the custom-operator ladder (SURVEY §2.8): the
  * semantics ("k best rows per key") are whole-operator — no composition
  * of built-ins avoids the full sort — so it gets a real plan node.
  *
  * Physical shape mirrors partial aggregation: a map-side phase keeps a
  * bounded heap per key per input partition and emits at most k rows per
  * (key, partition); the exchange then carries O(keys x k x partitions)
  * rows instead of the corpus; a final phase (hash-clustered on the keys
  * by EnsureRequirements) merges the survivors with the same heaps. The
  * top-k of unioned per-partition top-k sets IS the global top-k, so the
  * two-phase split is exact. Neither phase sorts anything: cost is
  * O(rows log k) with memory bounded by (distinct keys in partition) x k
  * rows — the win over the window form grows with partition size.
  *
  * Determinism contract: `order` must be a TOTAL order (include a
  * tiebreaker column) — same as the window idiom needs for a stable
  * rank. Output row order within a key is unspecified; callers sort.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** DataFrame-level entry: `order` columns may carry `.desc`/`.asc`
    * (bare columns default ascending). Requires the strategy to be
    * installed — [[GraftExtensions.registerInto]] or the session
    * extension. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
    val sortOrders = order.map(c => toExpr(c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      TopKPerKey(keys.map(toExpr), sortOrders, k, df.queryExecution.analyzed))
  }
}

/** Plans the logical node as final(partial(child)). */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // the final phase preserves the exchange's hash clustering — a
  // downstream groupBy on the same keys must not re-shuffle
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrders = order
    val childOutput = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // LazilyGeneratedOrdering: codegen'd comparator, serialization-safe.
      // "Best" = least under the SortOrder directions (rank 1 first).
      val ord = new LazilyGeneratedOrdering(sortOrders, childOutput)
      // java PQ root = least by comparator; root must be the WORST
      // retained row, so compare reversed
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row) // mutable buffer — copy only on first sight
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
