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
    spillRows: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  require(spillRows > 0, s"spill threshold must be positive, got $spillRows")
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
    case TopKPerKeyPlan(grouping, order, k, spillRows, child) =>
      TopKPerKeyExec(grouping, order, k, spillRows,
        TopKPerKeyPartialExec(grouping, order, k, spillRows,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** The shared heap pass: one bounded max-heap per key, O(n log k)
  * comparisons, O(|keys in partition| · k) retained rows — WITH a spill
  * story for adversarial key cardinality (ADVICE/VERDICT r6).
  *
  * In-memory state is an on-heap HashMap of k-element heaps of copied
  * UnsafeRows. When the retained-row count crosses `spillRows` (default
  * 4M; `graft.topk.spillRows` system property), the pass flushes every
  * current survivor to a local spill file — keys written in their
  * UnsafeRow BYTE order, each key's ≤ k rows contiguous — and clears the
  * map. At the end, the spill files plus a final flush are k-way MERGED
  * by key (binary key order is total and consistent across files because
  * equal keys have identical UnsafeProjection bytes — the same invariant
  * the HashMap already relies on): only ONE key's ≤ k·|epochs| candidate
  * rows are ever resident during the merge, so memory stays bounded at
  * ANY per-partition key cardinality, including every-row-distinct. The
  * no-spill fast path is unchanged — zero extra copies, zero I/O.
  */
private[plans] object TopKHeapPass {
  def defaultSpillRows: Int =
    sys.props.get("graft.topk.spillRows").map(_.toInt).getOrElse(1 << 22)

  private val keyBytesOrd: Ordering[Array[Byte]] = new Ordering[Array[Byte]] {
    override def compare(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Byte.compareUnsigned(a(i), b(i))
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(a.length, b.length)
    }
  }

  /** One spill file: per key, [keyLen keyBytes nRows [rowLen rowBytes]*],
    * keys in byte order, terminated by keyLen = -1.
    */
  private final class SpillReader(file: java.io.File, nFields: Int) {
    private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file), 1 << 16))
    var key: Array[Byte] = _
    var rows: Array[UnsafeRow] = _
    advance()
    /** Close the stream early (abandoned merge); file deletion is the
      * task-completion hook's job. */
    def close(): Unit = { key = null; rows = null; try in.close() catch { case _: Throwable => () } }
    def advance(): Unit = {
      val kl = in.readInt()
      if (kl < 0) { key = null; rows = null; in.close(); file.delete(): Unit }
      else {
        key = new Array[Byte](kl); in.readFully(key)
        rows = Array.fill(in.readInt()) {
          val rl = in.readInt(); val rb = new Array[Byte](rl)
          in.readFully(rb)
          val r = new UnsafeRow(nFields)
          r.pointTo(rb, rl)
          r
        }
      }
    }
  }

  def run(childOutput: Seq[Attribute], grouping: Seq[Expression],
          order: Seq[SortOrder], k: Int,
          spillRows: Int = defaultSpillRows,
          onSpill: Int => Unit = _ => ())(
          iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(grouping, childOutput)
    val toUnsafe = UnsafeProjection.create(childOutput.map(_.asInstanceOf[Expression]), childOutput)
    val ord = GenerateOrdering.generate(order, childOutput)
    // max-heap under `ord`: head = worst retained row, evicted first
    val heaps = scala.collection.mutable.HashMap
      .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
    var retained = 0
    val spills = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
    val openReaders = scala.collection.mutable.ArrayBuffer.empty[SpillReader]

    def flush(): Unit = {
      if (spills.isEmpty) {
        // a consumer that abandons the merge iterator early (LIMIT above
        // us) would otherwise leak files and open streams until JVM exit;
        // the task-completion hook reclaims both (SpillReader deletes
        // fully-read files itself, so this is normally a no-op). No
        // deleteOnExit: its JVM-global registry grows per file and is
        // never pruned — an unbounded leak in long-lived executors.
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          openReaders.foreach(_.close())
          spills.foreach(f => if (f.exists()) { f.delete(): Unit })
        }
      }
      // spill onto spark.local.dir's provisioned disks, NOT java.io.tmpdir
      val f = java.io.File.createTempFile("graft-topk-spill", ".bin",
        org.apache.spark.graft.SparkInternals.localDir())
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f), 1 << 16))
      heaps.toArray.sortBy { case (key, _) => key.getBytes }(keyBytesOrd)
        .foreach { case (key, heap) =>
          val kb = key.getBytes
          out.writeInt(kb.length); out.write(kb)
          val rows = heap.toArray // heap order; re-heaped at merge
          out.writeInt(rows.length)
          rows.foreach { r =>
            val rb = r.getBytes
            out.writeInt(rb.length); out.write(rb)
          }
        }
      out.writeInt(-1); out.close()
      spills += f
      onSpill(retained)
      heaps.clear(); retained = 0
    }

    while (iter.hasNext) {
      val row0 = iter.next()
      val key = keyProj(row0)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < k) { heap += toUnsafe(row0).copy(); retained += 1 }
          else if (ord.compare(row0, heap.head) < 0) {
            heap.dequeue(); heap += toUnsafe(row0).copy(): Unit
          }
        case None =>
          val heap = new scala.collection.mutable.PriorityQueue[UnsafeRow]()(ord.on((r: UnsafeRow) => r))
          heap += toUnsafe(row0).copy()
          heaps.put(key.copy(), heap): Unit
          retained += 1
      }
      if (retained >= spillRows) flush()
    }

    if (spills.isEmpty) {
      // emit each key's survivors in ordering position 1..k (dequeueAll
      // yields worst-first; reverse) — k·|keys| rows, the only state left
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    } else {
      if (heaps.nonEmpty) flush()
      val nFields = childOutput.length
      // k-way merge via a min-queue over reader heads: per distinct key
      // the cost is O(m log F) for the m files holding it, NOT O(F) — at
      // hundreds of epochs a linear head-scan per key dominated the pass
      // (measured 26 s on the q_topk_spill gate at sf0.1; ~3 s with this).
      val readerQueue = new scala.collection.mutable.PriorityQueue[SpillReader]()(
        Ordering.by((r: SpillReader) => r.key)(keyBytesOrd.reverse))
      spills.foreach { f =>
        val r = new SpillReader(f, nFields)
        openReaders += r
        if (r.key != null) readerQueue += r
      }
      new Iterator[InternalRow] {
        private var pending: Iterator[UnsafeRow] = Iterator.empty
        private def refill(): Unit = {
          if (readerQueue.isEmpty) return
          val minKey = readerQueue.head.key
          val heap = new scala.collection.mutable.PriorityQueue[UnsafeRow]()(ord.on((r: UnsafeRow) => r))
          while (readerQueue.nonEmpty &&
            keyBytesOrd.compare(readerQueue.head.key, minKey) == 0) {
            val r = readerQueue.dequeue()
            r.rows.foreach { row =>
              if (heap.size < k) heap += row
              else if (ord.compare(row, heap.head) < 0) { heap.dequeue(); heap += row: Unit }
            }
            r.advance()
            if (r.key != null) readerQueue += r
          }
          pending = heap.dequeueAll.reverseIterator
        }
        override def hasNext: Boolean = {
          if (!pending.hasNext) refill()
          pending.hasNext
        }
        override def next(): InternalRow = pending.next()
      }
    }
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
    spillRows: Int,
    child: SparkPlan) extends UnaryExecNode {

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "spillEpochs" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "spill epochs"),
    "spilledRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "spilled rows"))

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupingExprs, orderExprs, kk, sr) =
      (child.output, grouping, order, k, spillRows)
    val (me, mr) = (metrics("spillEpochs"), metrics("spilledRows"))
    child.execute().mapPartitions(TopKHeapPass.run(childOutput, groupingExprs,
      orderExprs, kk, sr, onSpill = n => { me.add(1); mr.add(n) }))
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    grouping: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    spillRows: Int,
    child: SparkPlan) extends UnaryExecNode {

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "spillEpochs" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "spill epochs"),
    "spilledRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "spilled rows"))

  override def output: Seq[Attribute] = child.output

  /** The one exchange: cluster by key. NO required ordering — that is the
    * point (the window plan would demand a full sort here).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(grouping) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, groupingExprs, orderExprs, kk, sr) =
      (child.output, grouping, order, k, spillRows)
    val (me, mr) = (metrics("spillEpochs"), metrics("spilledRows"))
    child.execute().mapPartitions(TopKHeapPass.run(childOutput, groupingExprs,
      orderExprs, kk, sr, onSpill = n => { me.add(1); mr.add(n) }))
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
                 order: Seq[(String, Boolean)], k: Int,
                 spillRows: Int = TopKHeapPass.defaultSpillRows): DataFrame = {
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
      TopKPerKeyPlan(keys.map(attr), sortOrders, k, spillRows, lp))
  }
}
