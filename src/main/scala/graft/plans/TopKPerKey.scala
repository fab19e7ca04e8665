package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
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
/** Which rank function's `<= k` selection the operator computes. All three
  * are semigroups (survivors of a union survive in their own half, and
  * every strictly-better row of a survivor is itself a survivor, so
  * partial results merge losslessly) — the partial/final split and the
  * overflow emit-and-reset stay correct for each:
  *  - [[TopKMode.RowNumber]]: exactly k rows per key (heap-bounded).
  *  - [[TopKMode.Rank]]: rows with < k strictly-better rows — tie groups
  *    survive whole, so per-key state is k plus the worst tie group.
  *  - [[TopKMode.DenseRank]]: rows among the k best DISTINCT order
  *    values — state is bounded by k tie groups. */
sealed trait TopKMode
object TopKMode {
  case object RowNumber extends TopKMode
  case object Rank extends TopKMode
  case object DenseRank extends TopKMode
}

case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, mode: TopKMode, child: LogicalPlan) extends UnaryNode {
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
    // Deterministic only: a predicate like rand() < 0.5 has an EMPTY
    // reference set (trivially a subset of the keys) yet sampling input
    // rows before selection changes which rows win the top k — same
    // reason Spark's PushPredicateThroughNonJoin gates on deterministic.
    case f @ Filter(cond, t: TopKPerKeyNode)
        if cond.deterministic &&
          t.keys.forall(_.isInstanceOf[Attribute]) &&
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
  * the predicate is a bare `<= literal` / `< literal` / `= 1`, and no
  * projected expression references the rank. An EMPTY partition spec
  * (global top-k) is rewritten too — to Spark's canonical
  * `Limit(k, Sort(ord))`, which plans as TakeOrderedAndProject (bounded
  * per-partition priority queues, single-partition merge). Spark 4's own
  * optimizer already inserts that Limit+Sort UNDER the window but leaves
  * the Window + rank Filter running on top; the rewrite strips that
  * leftover machinery. Queries that keep the rank in their output
  * (w_row_number_topk) are untouched.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, GlobalLimit, Limit, LocalLimit, Project, Sort, Window => LWindow}
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
    * matching one rather than stacking the two. Safe when it carries the
    * SAME rank function (row_number/rank/dense_rank pre-filters differ
    * only in tie handling) with a bound at least as loose as ours. */
  private def stripGroupLimit(child: LogicalPlan, w: LWindow, k: Int,
      wf: Expression): LogicalPlan = child match {
    case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
        if g.rankLikeFunction.getClass == wf.getClass &&
          g.partitionSpec == w.partitionSpec &&
          g.orderSpec == w.orderSpec && g.limit >= k => g.child
    case other => other
  }

  /** Empty-partition analog of [[stripGroupLimit]]: for a global window
    * Spark inserts `GlobalLimit(k, LocalLimit(k, Sort(ord)))` under it —
    * strip a matching stack so the rewrite's own Limit+Sort replaces it
    * rather than stacking on top. */
  private def stripLimitSort(child: LogicalPlan, w: LWindow, k: Int,
      wf: Expression): LogicalPlan = child match {
    case GlobalLimit(IntegerLiteral(l), LocalLimit(_, Sort(so, true, grand, _)))
        if l >= k && so == w.orderSpec => grand
    case other => stripGroupLimit(other, w, k, wf)
  }

  /** Opt-out: the heap operator holds ≤ k row copies per key on-heap,
    * bounded at [[TopK.MaxPartialKeysFlag]] distinct keys map-side
    * (overflow emits-and-resets), vs the Window path's spillable
    * ExternalSorter. `SET spark.graft.topk.rewrite=false` restores the
    * window plan for workloads where even k·maxPartialKeys rows/partition
    * is too much. */
  val RewriteFlag = "spark.graft.topk.rewrite"

  private def modeOf(wf: Expression): Option[TopKMode] = wf match {
    case _: RowNumber => Some(TopKMode.RowNumber)
    case _: Rank => Some(TopKMode.Rank)
    case _: DenseRank => Some(TopKMode.DenseRank)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString(RewriteFlag, "true") != "true") plan
    else plan.transformUp {
      case p @ Project(plist, Filter(cond, w: LWindow))
          if w.windowExpressions.size == 1 =>
        w.windowExpressions.head match {
          case a @ Alias(WindowExpression(wf, _), _) if modeOf(wf).nonEmpty =>
            val mode = modeOf(wf).get
            val rn = a.toAttribute
            rankBound(cond, rn) match {
              case Some(k) if k > 0 &&
                  !plist.exists(_.references.contains(rn)) =>
                if (w.partitionSpec.nonEmpty)
                  Project(plist, TopKPerKeyNode(w.partitionSpec, w.orderSpec, k,
                    mode, stripGroupLimit(w.child, w, k, wf)))
                else if (mode == TopKMode.RowNumber)
                  // global row_number: Spark's canonical Limit+Sort plans
                  // as TakeOrderedAndProject — already optimal
                  Project(plist, Limit(Literal(k),
                    Sort(w.orderSpec, global = true,
                      stripLimitSort(w.child, w, k, wf))))
                else
                  // global rank/dense_rank: boundary ties make Limit+Sort
                  // inequivalent, but the empty-key heap node is exact —
                  // partials keep tie-bounded survivors per partition,
                  // one single-reducer final merge
                  Project(plist, TopKPerKeyNode(Nil, w.orderSpec, k, mode,
                    stripGroupLimit(w.child, w, k, wf)))
              case _ => p
            }
          case _ => p
        }
    }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, mode, child) =>
      TopKPerKeyExec(keys, order, k, mode, partial = false,
        TopKPerKeyExec(keys, order, k, mode, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, mode: TopKMode, partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // empty keys = global top-k: all partial survivors (≤ k per map
    // partition) meet at a single reducer
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    // Memory safety: the map-side pass would otherwise hold ≤ k row
    // copies for EVERY distinct key in the partition with no spill — an
    // OOM at o_custkey-like cardinality. Top-k is a semigroup, so the
    // partial exec may flush its state early at any point (the final
    // stage re-reduces) — exactly Spark's hash-agg partial fallback.
    // Two flush triggers, partial side only (the final side must hold
    // one complete heap per key it owns, receives ≤ k·partitions rows
    // per key, and relies on the shuffle having spread keys):
    //  - a hard distinct-key cap (backstop, configurable), and
    //  - EXECUTION-MEMORY PRESSURE: heap-state bytes are acquired from
    //    the TaskMemoryManager as they grow, so this operator competes
    //    fairly with spillable operators in the same task; a denied
    //    acquisition flushes instead of overcommitting the heap.
    val maxKeys =
      if (partial) conf.getConfString(TopK.MaxPartialKeysFlag, "65536").toInt
      else Int.MaxValue
    val heapMode = mode
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // codegen'd row comparator for the requested sort order; heap head
      // is the WEAKEST of the current top k (reverse ordering)
      val rowOrd: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      val taskCtx = org.apache.spark.TaskContext.get()
      val tmm =
        if (taskCtx == null) null
        else org.apache.spark.sql.GraftBridge.taskMemoryManager(taskCtx)
      val consumer =
        if (maxKeys != Int.MaxValue && tmm != null)
          new org.apache.spark.memory.MemoryConsumer(
              tmm, tmm.pageSizeBytes(),
              org.apache.spark.memory.MemoryMode.ON_HEAP) {
            // state is on-heap java objects released only at flush
            // boundaries; a forced spill request can reclaim nothing
            // here — pressure is answered at the next acquisition
            override def spill(size: Long,
                trigger: org.apache.spark.memory.MemoryConsumer): Long = 0L
          }
        else null
      def rowSizeOf(row: InternalRow): Long = (row match {
        case u: UnsafeRow => u.getSizeInBytes.toLong
        case _ => 64L
      }) + 32L // object header + container slot

      /** Per-key survivor state for one rank mode. insert() copies any
        * retained row and returns the net change in retained state bytes
        * (negative when an insert triggers tie-group eviction);
        * growthBound() is a pre-insert upper bound on that delta, 0 when
        * the insert cannot grow state — memory is negotiated against it
        * BEFORE mutating, so a denied acquisition can still flush a
        * consistent map. */
      abstract class KeyHeap {
        def growthBound(row: InternalRow): Long
        def insert(row: InternalRow): Long
        def rowIterator: java.util.Iterator[InternalRow]
      }

      /** row_number: exactly k rows; classic bounded reverse-heap. */
      final class RowNumberHeap extends KeyHeap {
        // small initial capacity: PriorityQueue allocates its backing
        // array eagerly, and limit can be huge while groups are tiny —
        // it grows on demand either way
        private val pq = new java.util.PriorityQueue[InternalRow](
          math.min(limit, 16) + 1, rowOrd.reverse)
        override def growthBound(row: InternalRow): Long =
          if (pq.size < limit) rowSizeOf(row) else 0L
        override def insert(row: InternalRow): Long =
          if (pq.size < limit) { pq.add(row.copy()); rowSizeOf(row) }
          else if (rowOrd.compare(row, pq.peek()) < 0) {
            pq.poll() // replacement: ~net-zero state bytes
            pq.add(row.copy()); 0L
          } else 0L
        override def rowIterator: java.util.Iterator[InternalRow] =
          pq.iterator()
      }

      /** rank / dense_rank: tie groups survive whole. A comparator-keyed
        * TreeMap holds one entry per distinct order value (the entry's
        * list is the tie group); the invariant after every insert is
        * "every group still selected by the mode's <= k rule":
        *  - rank: strictly-better rows of the worst group < k
        *  - dense_rank: at most k groups. */
      final class RankHeap(dense: Boolean) extends KeyHeap {
        private val map = new java.util.TreeMap[InternalRow,
          java.util.ArrayList[InternalRow]](rowOrd)
        private var total = 0

        override def growthBound(row: InternalRow): Long =
          if (map.isEmpty) rowSizeOf(row)
          else {
            val cmpLast = rowOrd.compare(row, map.lastKey())
            val mayAccept =
              if (dense) map.size < limit || cmpLast <= 0
              else total < limit || cmpLast <= 0
            if (mayAccept) rowSizeOf(row) else 0L
          }

        override def insert(row: InternalRow): Long = {
          var delta = 0L
          val group = map.get(row)
          if (group != null) {
            // the group is in the map, so it survives; ties share its rank
            group.add(row.copy()); total += 1; delta += rowSizeOf(row)
          } else {
            val cmpLast =
              if (map.isEmpty) -1 else rowOrd.compare(row, map.lastKey())
            val accept =
              if (dense) map.size < limit || cmpLast < 0
              else total < limit || cmpLast < 0
            if (accept) {
              val cp = row.copy()
              val lst = new java.util.ArrayList[InternalRow](2)
              lst.add(cp)
              map.put(cp, lst); total += 1; delta += rowSizeOf(row)
            }
          }
          // evict worst groups the insert pushed past the k rule
          var done = map.isEmpty
          while (!done) {
            val last = map.lastEntry()
            val lastSize = last.getValue.size
            val evict =
              if (dense) map.size > limit
              else total - lastSize >= limit
            if (evict) {
              map.remove(last.getKey); total -= lastSize
              val it = last.getValue.iterator()
              while (it.hasNext) delta -= rowSizeOf(it.next())
            } else done = true
          }
          delta
        }

        override def rowIterator: java.util.Iterator[InternalRow] = {
          val groups = map.values().iterator()
          new java.util.Iterator[InternalRow] {
            private var cur: java.util.Iterator[InternalRow] =
              java.util.Collections.emptyIterator()
            override def hasNext: Boolean = {
              while (!cur.hasNext && groups.hasNext) cur = groups.next().iterator()
              cur.hasNext
            }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException("empty iterator")
              cur.next()
            }
          }
        }
      }

      def newHeap(): KeyHeap = heapMode match {
        case TopKMode.RowNumber => new RowNumberHeap
        case TopKMode.Rank => new RankHeap(dense = false)
        case TopKMode.DenseRank => new RankHeap(dense = true)
      }

      // Streams output in chunks: ingest rows until the key map would
      // exceed maxKeys (or memory is denied), emit-and-reset, continue.
      // No global barrier — chunks of the SAME key re-merge at the
      // final exec.
      class ChunkedTopKIterator extends Iterator[InternalRow] {
        private var heaps = new java.util.HashMap[UnsafeRow, KeyHeap]()
        private var drain: java.util.Iterator[KeyHeap] =
          java.util.Collections.emptyIterator()
        private var cur: java.util.Iterator[InternalRow] =
          java.util.Collections.emptyIterator()
        private var inputDone = false
        // bytes granted by the memory manager / our live-state estimate;
        // drainBytes keeps the reservation honest for a flushed chunk
        // that is still being emitted (its rows are live until consumed)
        private[plans] var reserved = 0L
        private var usedBytes = 0L
        private var drainBytes = 0L
        private val Chunk = 4L << 20

        private def rowSize(row: InternalRow): Long = rowSizeOf(row)

        /** Reserve `need` more bytes of execution memory (chunked);
          * false = denied, caller must flush. Always true when no task
          * memory manager is in scope (final exec, driver-local). */
        private def ensure(need: Long): Boolean = {
          if (consumer == null) return true
          if (usedBytes + drainBytes + need <= reserved) return true
          reserved += consumer.acquireMemory(
            math.max(Chunk, usedBytes + drainBytes + need - reserved))
          usedBytes + drainBytes + need <= reserved
        }

        private[plans] def release(): Unit = {
          usedBytes = 0
          drainBytes = 0
          if (consumer != null && reserved > 0) {
            consumer.freeMemory(reserved)
            reserved = 0
          }
        }

        /** Emit-and-reset, seeding the fresh map with the row that
          * triggered the flush — unconditional, so progress is
          * guaranteed even under total memory denial (degrades to
          * chunk-per-row, still correct by the semigroup law). The old
          * chunk's bytes move to `drainBytes` (NOT freed yet — its rows
          * stay live until the drain is consumed); the reservation is
          * recycled once the drain completes. */
        private def flushAndSeed(key: UnsafeRow, row: InternalRow): Unit = {
          drain = heaps.values().iterator()
          heaps = new java.util.HashMap()
          drainBytes = usedBytes
          val h = newHeap()
          heaps.put(key.copy(), h)
          usedBytes = rowSize(key) + h.insert(row)
        }

        /** Consume input until either a flush is pending or input ends;
          * leaves `drain` pointing at the state to emit. */
        private def ingest(): Unit = {
          while (rows.hasNext) {
            val row = rows.next()
            val key = keyProj(row)
            val heap = heaps.get(key)
            if (heap == null) {
              val need = rowSize(key) + rowSize(row)
              if (heaps.size() >= maxKeys || !ensure(need)) {
                flushAndSeed(key, row)
                return
              }
              val h = newHeap()
              heaps.put(key.copy(), h)
              usedBytes += rowSize(key) + h.insert(row)
            } else {
              val bound = heap.growthBound(row)
              if (bound > 0 && !ensure(bound)) { flushAndSeed(key, row); return }
              usedBytes += heap.insert(row)
            }
          }
          inputDone = true
          drain = heaps.values().iterator()
          heaps = new java.util.HashMap() // release for GC while draining
          drainBytes = usedBytes
          usedBytes = 0
        }

        override def hasNext: Boolean = {
          while (!cur.hasNext) {
            if (drain.hasNext) cur = drain.next().rowIterator
            else if (inputDone) { release(); return false }
            else { drainBytes = 0; ingest() } // previous chunk fully emitted
          }
          true
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          cur.next()
        }
      }
      val iter = new ChunkedTopKIterator
      // a task killed/limited mid-stream must not strand the reservation
      if (taskCtx != null)
        taskCtx.addTaskCompletionListener[Unit](_ => iter.release())
      iter
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopK {

  /** Hard ceiling on distinct keys held by one PARTIAL exec's heap map;
    * on overflow the map is emitted and reset (correct by the semigroup
    * law — the final stage re-reduces duplicated keys). Bounds map-side
    * memory at ≤ k·maxPartialKeys row copies regardless of key
    * cardinality. This is the BACKSTOP: the partial exec also registers
    * a MemoryConsumer with the TaskMemoryManager and flushes whenever an
    * execution-memory acquisition is denied, so under real pressure the
    * effective bound is the task's fair memory share, not this count. */
  val MaxPartialKeysFlag = "spark.graft.topk.maxPartialKeys"

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
    * unspecified — add a final orderBy. `mode` selects the rank rule:
    * [[TopKMode.RowNumber]] (exactly k), [[TopKMode.Rank]] /
    * [[TopKMode.DenseRank]] (tie groups kept whole, like the matching
    * window function's `<= k` filter).
    *
    * Column names, not Columns: the custom logical node needs plain
    * catalyst `UnresolvedAttribute`s the analyzer resolves in place —
    * Spark 4's Column wraps a lazily-converted ColumnNode that only
    * standard nodes convert. */
  def perKey(df: DataFrame, keyCols: Seq[String],
      order: Seq[(String, Boolean)], k: Int,
      mode: TopKMode = TopKMode.RowNumber): DataFrame = {
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
      TopKPerKeyNode(keys, sortOrder, k, mode, GraftBridge.plan(df)))
  }

  /** GLOBAL top-k (no grouping): partials keep ≤ k rows per map
    * partition, the final heap runs on a single reducer over ≤
    * k·partitions candidate rows — never the full input, unlike a
    * global-window row_number plan. */
  def global(df: DataFrame, order: Seq[(String, Boolean)],
      k: Int): DataFrame = perKey(df, Nil, order, k)
}
