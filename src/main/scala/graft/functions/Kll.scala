package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic KLL-class mergeable quantile sketch (compactor hierarchy
  * of Karnin-Lang-Liberty 2016, with the uniform per-level capacity and
  * DETERMINISTIC compaction of its MRL99 ancestor — Manku, Rajagopalan &
  * Lindsay). This is the mergeable companion to the GK summary behind
  * `percentile_approx` (q_approx_median): GK summaries do not re-aggregate,
  * so a pre-aggregated quantile table can't roll up in sketch space the way
  * the HLL family does (q_hll_rollup / q_hll_incremental). This sketch can:
  * per-partition/per-group sketch rows union levelwise and re-compact,
  * closing the sketch story (count-distinct → HLL, frequency → CMS/MG,
  * quantiles → this).
  *
  * Structure: level h holds a buffer of values each standing for 2^h
  * original items. Inserts append at level 0; when a level reaches
  * `k` items it compacts — sort, pair adjacent items, promote one item
  * per pair to level h+1 (weight conservation: (k/2)·2^(h+1) = k·2^h; an
  * odd straggler stays at level h). The survivor parity is derived from
  * the buffer CONTENT (a stable hash), not a random bit: the sketch is a
  * pure function of the multiset of merges performed, so reruns on the
  * same data/partitioning are identical, and no RNG state needs encoding.
  *
  * Error bound (deterministic, any parity choice): one compaction at
  * level h perturbs any rank by ≤ 2^(h-1); level h compacts at most
  * n/(k·2^h) times, so total rank error ≤ Σ_h n/(k·2^h)·2^(h-1) = n·H/(2k)
  * with H ≈ log2(n/k) levels — ε = H/(2k). At k = 512 that is ≤ 1% for
  * n ≤ 6·10^8 and ≤ 2% for n ≤ 10^12; the gates test the 2% contract via
  * EXACT rank intervals (never sketch-vs-sketch).
  *
  * Scale posture: fixed O(k·log(n/k)) state per partial regardless of
  * input size, associative merge — the same properties that make HLL the
  * 100 TB distinct-count answer make this the 100 TB quantile answer.
  * Merge order across partials can permute survivor choices; the rank
  * GUARANTEE is order-independent (the gates pin the bound, exact values
  * come from exact twins).
  */
object Kll {

  type State = Seq[Seq[Double]]

  val empty: State = Vector(Vector.empty[Double])

  private def parity(sorted: IndexedSeq[Double]): Int = {
    var h = 1469598103934665603L // FNV offset basis — any fixed seed works
    var i = 0
    while (i < sorted.length) {
      h = (h ^ java.lang.Double.doubleToLongBits(sorted(i))) * 1099511628211L
      i += 1
    }
    (h & 1L).toInt
  }

  /** Cascade-compact every level at/over capacity k (bottom-up, so a
    * promotion that fills level h+1 is handled in the same sweep).
    */
  def compact(levels: State, k: Int): State = {
    var ls = levels.toVector.map(_.toVector)
    var h = 0
    while (h < ls.length) {
      if (ls(h).length >= k) {
        val sorted = ls(h).sorted.toIndexedSeq
        val pairs = sorted.length / 2
        val p = parity(sorted)
        val kept = Vector.tabulate(pairs)(i => sorted(2 * i + p))
        // odd straggler keeps its weight at level h (conservation)
        val carry =
          if (sorted.length % 2 == 1) Vector(sorted.last) else Vector.empty
        val padded = if (h + 1 < ls.length) ls else ls :+ Vector.empty[Double]
        ls = padded.updated(h, carry)
        ls = ls.updated(h + 1, ls(h + 1) ++ kept)
      }
      h += 1
    }
    ls
  }

  def insert(levels: State, v: Double, k: Int): State = {
    val l0 = levels.head :+ v
    if (l0.length < k) levels.updated(0, l0)
    else compact(levels.updated(0, l0), k)
  }

  def merge(a: State, b: State, k: Int): State = {
    val n = math.max(a.length, b.length)
    val joined = Vector.tabulate(n) { h =>
      val av = if (h < a.length) a(h).toVector else Vector.empty[Double]
      val bv = if (h < b.length) b(h).toVector else Vector.empty[Double]
      av ++ bv
    }
    compact(joined, k)
  }

  /** Weighted-rank quantile estimate: smallest value whose cumulative
    * weight reaches q·W. NaN on an empty sketch.
    */
  def quantile(levels: State, q: Double): Double = {
    val items = (for {
      (buf, h) <- levels.zipWithIndex
      v <- buf
    } yield (v, 1L << h)).sortBy(_._1)
    if (items.isEmpty) Double.NaN
    else {
      val total = items.iterator.map(_._2).sum
      val target = q * total
      var cum = 0L
      items.find { case (_, w) => cum += w; cum >= target }
        .map(_._1).getOrElse(items.last._1)
    }
  }
}

/** Sketch-BUILD aggregator: doubles in, sketch state out (the "sketch row"
  * a pre-aggregated quantile table stores, by analogy with hll_sketch_agg).
  */
class KllAggregator(k: Int)
    extends Aggregator[Double, Kll.State, Kll.State] {
  override def zero: Kll.State = Kll.empty
  override def reduce(buf: Kll.State, v: Double): Kll.State =
    Kll.insert(buf, v, k)
  override def merge(a: Kll.State, b: Kll.State): Kll.State =
    Kll.merge(a, b, k)
  override def finish(buf: Kll.State): Kll.State = buf
  override def bufferEncoder: Encoder[Kll.State] =
    ExpressionEncoder[Kll.State]()
  override def outputEncoder: Encoder[Kll.State] =
    ExpressionEncoder[Kll.State]()
}

/** Sketch-UNION aggregator: re-aggregates stored sketch rows without
  * touching the base data (the hll_union_agg analogue).
  */
class KllMergeAggregator(k: Int)
    extends Aggregator[Kll.State, Kll.State, Kll.State] {
  override def zero: Kll.State = Kll.empty
  override def reduce(buf: Kll.State, v: Kll.State): Kll.State =
    Kll.merge(buf, v, k)
  override def merge(a: Kll.State, b: Kll.State): Kll.State =
    Kll.merge(a, b, k)
  override def finish(buf: Kll.State): Kll.State = buf
  override def bufferEncoder: Encoder[Kll.State] =
    ExpressionEncoder[Kll.State]()
  override def outputEncoder: Encoder[Kll.State] =
    ExpressionEncoder[Kll.State]()
}
