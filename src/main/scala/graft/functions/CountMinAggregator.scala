package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.MurmurHash3

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed Aggregator —
  * approximate per-key frequencies in fixed memory.
  *
  * Why not `groupBy(key).count()`? Same scale argument as
  * [[MisraGriesAggregator]]: exact counting shuffles one partial per
  * DISTINCT key, so a high-cardinality column drags a
  * distinct-cardinality-sized exchange. The CM sketch is a `depth × width`
  * Long grid: every partial buffer and every merge carries the same few-KB
  * array no matter how many distinct keys exist, and merge is elementwise
  * addition — associative, commutative, order-independent, so the result
  * is deterministic for a given dataset (the driver-gate requirement).
  *
  * Estimate contract: `estimate(k)` = min over rows of the k-slot counter.
  * Never under-counts (every true occurrence is added to each row's slot);
  * over-counts by colliding keys' mass — at most `e/width · N` per row
  * with probability `1 − e^{−depth}` (the classic bound), which
  * `q_cms_freq` gates as a boolean pair the oracle pins to TRUE.
  *
  * Hashing is seeded MurmurHash3 over the key string — fixed seeds per
  * row, no RNG, identical on every executor and every run.
  */
class CountMinAggregator(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], v: String): Array[Long] = {
    // SQL-aggregate null convention: nulls are skipped, not counted (and
    // never reach the hash — a null key used to NPE inside the task)
    if (v == null) return buf
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.slot(v, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {
  /** Row-seeded slot for a key: MurmurHash3(string, seed_r) mod width. */
  def slot(s: String, row: Int, width: Int): Int =
    math.floorMod(MurmurHash3.stringHash(s, 0x9747b28c + row), width)

  /** Point estimate = min over rows (the CM upper-bound estimator).
    * Null keys were never counted ([[CountMinAggregator.reduce]] skips
    * them), so their estimate is 0 by definition.
    */
  def estimate(sketch: Seq[Long], depth: Int, width: Int, s: String): Long = {
    if (s == null) return 0L
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch(r * width + slot(s, r, width))
      if (v < best) best = v
      r += 1
    }
    best
  }
}
