package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed Aggregator (brief: custom
  * `TypedColumn` aggregation functions).
  *
  * Scale rationale: `row_number().over(Window.partitionBy(g).orderBy(v))`
  * sorts every group in full before discarding all but k rows; this
  * aggregator keeps a k-bounded buffer per group through the map-side
  * partial aggregation, so the shuffle carries at most k values per group
  * per task and nothing is ever fully sorted. The k·tasks bound is the
  * same trick the window's rank-limit pushdown approximates, but it works
  * inside any aggregation (including streaming complete mode).
  *
  * Returns the top-k values in descending order (values, not rows — the
  * reduction is over the measure itself, so ties are value-deterministic).
  */
class TopKAggregator(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
  override def zero: List[Double] = Nil

  private def insert(buf: List[Double], v: Double): List[Double] = {
    // descending-ordered bounded insert
    val (hi, lo) = buf.span(_ >= v)
    val merged = hi ::: (v :: lo)
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[Double], v: Double): List[Double] = insert(buf, v)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
