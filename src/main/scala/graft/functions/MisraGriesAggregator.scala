package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The Misra-Gries frequent-items step, generic in the key type so the
  * SAME update/merge code backs both the batch typed Aggregator below and
  * the streaming heavy-hitter state in
  * [[graft.streaming.StreamOps.MgTopUsersProcessor]] — one proven kernel,
  * two execution surfaces.
  *
  * Guarantee (Misra & Gries 1982; merge form Agarwal et al. 2012,
  * "Mergeable Summaries", PODS): with `capacity` counters, every item with
  * true frequency > n/(capacity+1) survives reduce AND merge — decrements
  * only ever happen alongside `capacity` other decrements, so at most
  * n/(capacity+1) are applied to any key overall. Retained counts are
  * lower bounds on the true counts (exact iff no decrement ever ran,
  * i.e. distinct keys never exceeded `capacity`).
  */
object MisraGries {

  def reduce[K](buf: Map[K, Long], v: K, capacity: Int): Map[K, Long] =
    buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1)
      case None if buf.size < capacity => buf.updated(v, 1L)
      // classic MG step: the new item's +1 cancels against the global -1,
      // so decrement every counter and drop the zeros.
      case None => buf.collect { case (k, c) if c > 1 => k -> (c - 1) }
    }

  def merge[K](a: Map[K, Long], b: Map[K, Long], capacity: Int): Map[K, Long] = {
    val combined = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest count from all, drop <= 0 —
      // the offset each surviving counter absorbs is bounded by the mass
      // of the evicted tail, preserving the n/(capacity+1) error bound.
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      combined.collect { case (k, c) if c - cut > 0 => k -> (c - cut) }
    }
  }
}

/** Misra-Gries summary as a typed Aggregator — the candidate pass of
  * two-pass EXACT heavy hitters at 100 TB scale.
  *
  * Why not `groupBy(x).count.filter(cnt >= n/k)` directly? That shuffles
  * one partial count per DISTINCT value — on a high-cardinality column
  * (corpus tokens, user ids) the exchange is distinct-cardinality-sized.
  * The MG summary keeps at most `capacity` counters per partial buffer, so
  * the map-side partials and the merge tree carry a fixed few-KB state
  * regardless of cardinality, like the HLL/GK sketches in
  * [[graft.operators.Sketches]].
  *
  * A second exact counting pass restricted to the surviving candidates
  * makes the final output EXACT: items with freq ≥ n/k are provably a
  * subset of the candidates whenever capacity+1 > k.
  *
  * Counts in the summary are lower bounds, not exact — `finish` returns
  * only the candidate keys (sorted for determinism) and the recount pass
  * owns the numbers.
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    MisraGries.reduce(buf, v, capacity)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    MisraGries.merge(a, b, capacity)

  override def finish(buf: Map[String, Long]): Seq[String] = buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
