package graft

import graft.operators.{Dedup, Evolution, Graph, Similarity}
import org.apache.spark.sql.functions._

/** Edge cases + plan shapes for the round-8 operators. */
class Round8EdgeSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: single self-looped node keeps all mass at teleport+damp") {
    val one = Seq(("x", "x")).toDF("src", "dst")
    val r = Graph.pagerankOnEdges(one, iters = 3, k = 5).collect()
    assert(r.length == 1)
    // n=1: base = SCALE, every round p = 0.15·SCALE + 0.85·p → SCALE
    // (up to the two integer floors per round)
    assert(math.abs(r.head.getLong(1) - 1000000000000L) < 10)
  }

  test("mmr: fewer candidates than k returns all of them, ranked") {
    def vec(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(64 - xs.length)(0.0)).map(_.toFloat).toArray
    val emb = Seq((0L, vec(1.0)), (5L, vec(0.5)), (6L, vec(0.25)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb, nQ = 1, shortlist = 10, k = 5)
      .collect()
    assert(got.length == 2) // only two candidates exist
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2))
  }

  test("containment: sub-shingle-width docs fall back to the whole-text shingle") {
    val docs = Seq(
      (1L, "ab cd"),              // < 3 tokens → single whole-text shingle
      (2L, "ab cd"),              // identical → containment 1 both ways
      (3L, "zz yy")
    ).toDF("doc_id", "text")
    val rows = Dedup.containmentNearDups(docs, "doc_id", "text",
        hasher = Dedup.Md5Hash)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSet == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
  }

  test("psi: all-reference input (no weekend rows) still returns a finite row") {
    val mon = Seq.tabulate(40)(i => ("2024-01-01 10:00:00", i.toDouble))
      .toDF("ts_s", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("value"))
    val r = Evolution.psiDrift(mon).head()
    assert(r.getAs[Long]("n_cur") == 0)
    // degenerate current side: PSI against the +1-smoothed uniform is
    // finite (never NaN/Inf) — the monitor must not crash on a gap day
    assert(!r.getAs[Double]("psi").isNaN && !r.getAs[Double]("psi").isInfinite)
  }

  test("tier report on a dup-free corpus: all zeros, five rows") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "red green blue yellow purple")
    ).toDF("doc_id", "text")
    val rows = Dedup.dedupTierReport(docs).collect()
    assert(rows.length == 5) // r9 adds the exact_substring tier
    rows.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 0, r.toString)
    }
  }

  test("negative sampling plans the TopKPerKey exec, not a window") {
    val df = graft.operators.Curation.queries("q_negative_sample")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TopKPerKey"), physical)
    assert(!physical.contains("Window"), physical)
  }

  test("late interaction: shuffles only bounded aggregates, no window/cartesian-of-corpus") {
    val df = Similarity.queries("q_late_interaction")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"), physical)
    // the only nested-loop is the broadcast of the tiny query bag
    assert(!physical.contains("CartesianProduct"), physical)
  }
}
