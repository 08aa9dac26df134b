package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: the ranking measure plus a tie-breaking id. */
case class ScoredId(sim: Double, id: Long)

/** Bounded per-group top-k over (measure, id) pairs, ordered measure
  * descending then id ascending (the deterministic tie-break a ranked
  * retrieval result needs).
  *
  * Scale rationale (same as [[TopKAggregator]], which ranks bare values):
  * `row_number().over(Window.partitionBy(query).orderBy(sim))` shuffles
  * EVERY scored candidate into #queries partitions and fully sorts each —
  * with few queries and a 100 TB corpus that is skew-by-construction. This
  * aggregator keeps a k-bounded buffer per query through the map-side
  * partial aggregation, so the shuffle carries at most k (sim, id) pairs
  * per query per task and nothing is ever fully sorted.
  */
class TopKPairAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  override def zero: List[ScoredId] = Nil

  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  private def insert(buf: List[ScoredId], v: ScoredId): List[ScoredId] = {
    // descending-ordered bounded insert
    val (hi, lo) = buf.span(beats(_, v))
    val merged = hi ::: (v :: lo)
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[ScoredId], v: ScoredId): List[ScoredId] =
    insert(buf, v)

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
