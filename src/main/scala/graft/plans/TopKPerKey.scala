package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: bounded-heap top-k per key.
  *
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` — the
  * idiomatic formulation — shuffles EVERY row of every key group and then
  * fully sorts each group, only to discard all but k rows. This operator
  * keeps a k-bounded heap per key instead, and is planned as a
  * partial/final pair (top-k is a semigroup: topk(A ∪ B) =
  * topk(topk(A) ∪ topk(B))):
  *
  *   TopKPerKeyExec(final)    — requires ClusteredDistribution(keys)
  *     Exchange hashpartitioning(keys)   — carries ≤ k rows/key/partition
  *       TopKPerKeyExec(partial)         — map-side, no distribution req
  *
  * so the shuffle volume drops from |rows| to ≤ k·|keys|·|partitions| —
  * at 100 TB the difference between shuffling the fact table and
  * shuffling a bounded candidate set. No sort happens anywhere: heap
  * maintenance is O(log k) per row and emission order is left to the
  * query's final ORDER BY.
  *
  * The full custom-operator ladder from the design brief: logical node +
  * optimizer rule ([[TopKFilterPushdown]]) + strategy + physical exec,
  * injectable via `SparkSessionExtensions` ([[graft.GraftExtensions]])
  * or post-hoc through `spark.experimental` ([[TopK.ensurePlanning]]).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** Catalyst cannot push a filter through an operator it doesn't know;
  * teach it the safe case — predicates over the KEY columns commute with
  * per-key top-k selection (they drop whole groups, never reorder within
  * one). */
object TopKFilterPushdown extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Sound only for PLAIN ATTRIBUTE keys: with an expression key like
    // `a % 10`, a predicate on `a` references only key inputs yet can
    // split a key group (a=5 vs a=15 share a group), changing which rows
    // win the top k.
    case f @ Filter(cond, t: TopKPerKeyNode)
        if t.keys.forall(_.isInstanceOf[Attribute]) &&
          cond.references.subsetOf(
            org.apache.spark.sql.catalyst.expressions.AttributeSet(t.keys)) =>
      t.copy(child = Filter(cond, t.child))
  }
}

/** Rewrite the idiomatic top-k-per-group pattern
  *
  *   Project(p)                          -- p does not reference rn
  *     Filter(rn <= k  |  rn = 1)
  *       Window(row_number() OVER (PARTITION BY keys ORDER BY ord) AS rn)
  *
  * into `TopKPerKeyNode(keys, ord, k)` — the rank column is provably
  * unobservable, so the bounded-heap operator returns the identical row
  * set without the per-group sort or the full-row shuffle. Fires only
  * when: exactly ONE window expression (the Window node can be dropped
  * whole), it is row_number (rank/dense_rank admit ties beyond k),
  * the predicate is a bare `<= literal` / `< literal` / `= 1`, the
  * partition spec is non-empty (global top-k would need a different
  * distribution), and no projected expression references the rank.
  * Queries that keep the rank in their output (w_row_number_topk) are
  * untouched.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window => LWindow}
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types.IntegerType

  private def rankBound(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        // k > 0 also guards the k-1 overflow at Int.MinValue (an
        // always-false filter must stay a filter, not become top-MaxValue)
        if a.semanticEquals(rn) && k > 0 => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.semanticEquals(rn) => Some(1)
      case EqualTo(Literal(1, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }

  /** Spark's own InferWindowGroupLimit has usually already inserted a
    * WindowGroupLimit under the window by the time user rules run; the
    * heap operator subsumes it (same bound, no sort), so strip a
    * matching one rather than stacking the two. */
  private def stripGroupLimit(child: LogicalPlan, w: LWindow,
      k: Int): LogicalPlan = child match {
    case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
        if g.rankLikeFunction.isInstanceOf[RowNumber] &&
          g.partitionSpec == w.partitionSpec &&
          g.orderSpec == w.orderSpec && g.limit >= k => g.child
    case other => other
  }

  /** Opt-out: the heap operator holds ≤ k row copies per distinct key
    * per partition on-heap without spill, vs the Window path's spillable
    * ExternalSorter. `SET spark.graft.topk.rewrite=false` restores the
    * window plan for extreme key-cardinality × k workloads. */
  val RewriteFlag = "spark.graft.topk.rewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(RewriteFlag, "true") != "true") plan
    else plan.transformUp {
      case p @ Project(plist, Filter(cond, w: LWindow))
          if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty =>
        w.windowExpressions.head match {
          case a @ Alias(WindowExpression(_: RowNumber, _), _) =>
            val rn = a.toAttribute
            rankBound(cond, rn) match {
              case Some(k) if k > 0 &&
                  !plist.exists(_.references.contains(rn)) =>
                Project(plist, TopKPerKeyNode(w.partitionSpec, w.orderSpec, k,
                  stripGroupLimit(w.child, w, k)))
              case _ => p
            }
          case _ => p
        }
    }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // codegen'd row comparator for the requested sort order; heap head
      // is the WEAKEST of the current top k (reverse ordering)
      val rowOrd: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (rows.hasNext) {
        val row = rows.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // small initial capacity: PriorityQueue allocates its backing
          // array eagerly, and limit can be huge while groups are tiny —
          // it grows on demand either way
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(limit, 16) + 1, rowOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val it = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var cur: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        override def hasNext: Boolean = {
          while (!cur.hasNext && it.hasNext) cur = it.next().iterator()
          cur.hasNext
        }
        override def next(): InternalRow = cur.next()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopK {

  /** Make the custom strategy + pushdown rule available on a live session
    * (idempotent); `GraftExtensions` injects the same pair at build time. */
  def ensurePlanning(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    Seq(TopKFilterPushdown, WindowTopKRewrite).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
  }

  /** Top-k rows per key group, ordered by `order` columns (`ascending =
    * false` for descending). Row order within and across groups is
    * unspecified — add a final orderBy.
    *
    * Column names, not Columns: the custom logical node needs plain
    * catalyst `UnresolvedAttribute`s the analyzer resolves in place —
    * Spark 4's Column wraps a lazily-converted ColumnNode that only
    * standard nodes convert. */
  def perKey(df: DataFrame, keyCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val spark = df.sparkSession
    ensurePlanning(spark)
    val keys = keyCols.map(UnresolvedAttribute.quoted)
    val sortOrder = order.map { case (name, ascending) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (ascending) Ascending else Descending)
    }
    GraftBridge.ofRows(spark,
      TopKPerKeyNode(keys, sortOrder, k, GraftBridge.plan(df)))
  }
}
