package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan (brief tier (c): logical node + Strategy +
  * physical exec, registered via `SparkSessionExtensions`): TOP-K PER KEY
  * without sorting.
  *
  * The built-in answer — `row_number() OVER (PARTITION BY key ORDER BY v)
  * ... WHERE rn <= k` — hash-partitions by key and then SORTS EVERY ROW of
  * every partition (O(n log n) CPU, full-partition spill under memory
  * pressure) only to discard all but k·|keys| rows. At 100 TB with
  * billions of rows and k=10 that sort is nearly pure waste.
  *
  * [[TopKPerKeyExec]] consumes the same clustered distribution (so
  * EnsureRequirements plans the identical single hash exchange) but
  * replaces the sort with one bounded heap per key: O(n log k) comparisons,
  * O(|keys in partition| · k) rows of state, nothing else retained. The
  * comparator is a codegen'd `GenerateOrdering` over the requested
  * `SortOrder`s, so per-row comparison cost matches the sort-based plan's.
  * Output rows surface exactly as the window+filter plan would emit them
  * (per key, ordering position 1..k) — [[graft.operators]] gates it
  * row-identical against the window oracle; callers needing a global
  * presentation order sort the k·|keys|-sized RESULT, not the input.
  *
  * Determinism contract (same as the window idiom): callers must make the
  * ordering total per key (tie-break on a unique column), otherwise both
  * this and `row_number` pick arbitrary peers.
  */
case class TopKPerKeyPlan(
    grouping: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner strategy: one custom logical node → a partial/final exec pair,
  * the aggregate pattern applied to top-k. The PARTIAL heaps within each
  * mapper's partition as the data lies (no required distribution), so the
  * exchange EnsureRequirements inserts above it for the FINAL's clustered
  * distribution carries at most k rows per key per mapper — O(k·keys·
  * mappers) shuffle volume instead of every input row (the window plan,
  * and the r5 single-exec form, shuffled all of them). Top-k is mergeable
  * (top-k of a union = top-k of per-part top-k's), so the final pass over
  * the partials is exact. Everything below `planLater`s back into
  * Catalyst's normal planning.
  */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(grouping, order, k, child) =>
      TopKPerKeyExec(grouping, order, k,
        TopKPerKeyPartialExec(grouping, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** The shared heap pass: one bounded max-heap per key, O(n log k)
  * comparisons, O(|keys in partition| · k) retained rows.
  *
  * Memory bound (NOT spillable): state is an on-heap HashMap of
  * k-element heaps of copied rows — fine up to ~10⁶–10⁷ (keys·k) rows
  * per partition (the partial pass only ever sees a mapper's split; the
  * final pass sees one hash partition's key range). A key space so large
  * AND so uniformly hot that a single partition's keys·k rows exceed heap
  * is the regime where the sort-based window plan (which spills) is the
  * right tool — callers there should raise shuffle partitions or fall
  * back; the heap exec's win is every other regime, where it removes the
  * full-partition sort+spill entirely.
  */
private[plans] object TopKHeapPass {
  def run(childOutput: Seq[Attribute], grouping: Seq[Expression],
          order: Seq[SortOrder], k: Int)(
          iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(grouping, childOutput)
    val ord = GenerateOrdering.generate(order, childOutput)
    // max-heap under `ord`: head = worst retained row, evicted first
    val heaps = scala.collection.mutable.HashMap
      .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < k) heap += row.copy()
          else if (ord.compare(row, heap.head) < 0) {
            heap.dequeue(); heap += row.copy(): Unit
          }
        case None =>
          val heap = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
          heap += row.copy()
          heaps.put(key.copy(), heap): Unit
      }
    }
    // emit each key's survivors in ordering position 1..k (dequeueAll
    // yields worst-first; reverse) — k·|keys| rows, the only state left
    heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
  }
}

/** Map-side partial: top-k per key within each incoming partition, no
  * distribution requirement — runs before the exchange and shrinks what
  * the shuffle carries to ≤ k rows per key per mapper.
  */
case class TopKPerKeyPartialExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupingExprs, orderExprs, kk) = (child.output, grouping, order, k)
    child.execute().mapPartitions(TopKHeapPass.run(childOutput, groupingExprs, orderExprs, kk))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** The one exchange: cluster by key. NO required ordering — that is the
    * point (the window plan would demand a full sort here).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(grouping) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupingExprs, orderExprs, kk) = (child.output, grouping, order, k)
    child.execute().mapPartitions(TopKHeapPass.run(childOutput, groupingExprs, orderExprs, kk))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  /** Install [[TopKStrategy]] on the session (idempotent). A deployment
    * does this once via `spark.sql.extensions=graft.functions.
    * GraftExtensions`; this path serves ad-hoc sessions.
    */
  def install(s: SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(TopKStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ TopKStrategy

  /** Top-k rows per key group, `order` as (column, ascending) pairs —
    * the caller includes a unique tie-break column for determinism.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String],
                 order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val s = df.sparkSession
    install(s)
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(s,
      TopKPerKeyPlan(keys.map(attr), sortOrders, k, lp))
  }
}
