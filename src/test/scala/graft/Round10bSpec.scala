package graft

import org.apache.spark.sql.functions._

/** Hand-computed gates for the round-10 batch-A operators: Moran's I,
  * Theil–Sen trend, count-min sketch, NDCG/MRR, and linear CKA.
  */
class Round10bSpec extends SparkSpec {
  import spark.implicits._

  // ---- Moran's I --------------------------------------------------------
  // moransI derives cells as (li = floor(acctbal/500), gi = custkey % 12);
  // a customer with acctbal = 500·li + 1 and custkey = 12·k + gi lands in
  // exactly cell (li, gi), so patterns can be planted cell by cell.

  private def customersFor(cells: Seq[((Int, Int), Int)]) = {
    var k = 0L
    cells.flatMap { case ((li, gi), cnt) =>
      (1 to cnt).map { _ =>
        k += 1
        (12 * k + gi, (500.0 * li + 1.0))
      }
    }.toDF("c_custkey", "c_acctbal")
  }

  test("moransI: one dense block among sparse cells autocorrelates positively") {
    // 3x3 grid: the 2x2 corner block heavy (9), everything else light (1)
    // -> neighbors of heavy cells are heavy, I > E[I].
    val cells = for (li <- 0 to 2; gi <- 0 to 2) yield
      ((li, gi), if (li <= 1 && gi <= 1) 9 else 1)
    val r = operators.Analytics.moransI(customersFor(cells)).collect()(0)
    assert(r.getAs[Long]("n_cells") === 9L)
    assert(r.getAs[Double]("morans_i") > r.getAs[Double]("expected_i"))
    assert(r.getAs[Double]("morans_i") > 0.1)
  }

  test("moransI: a checkerboard anti-correlates below E[I]") {
    // Under QUEEN adjacency the 4 diagonal neighbors share the cell's
    // color, so a checkerboard's I is mildly negative (rook-only would
    // be strongly negative) — the gate is I < E[I], not a deep minimum.
    val cells = for (li <- 0 to 3; gi <- 0 to 3) yield
      ((li, gi), if ((li + gi) % 2 == 0) 9 else 1)
    val r = operators.Analytics.moransI(customersFor(cells)).collect()(0)
    assert(r.getAs[Double]("morans_i") < r.getAs[Double]("expected_i"))
    assert(r.getAs[Double]("morans_i") < -0.1)
  }

  // ---- Theil–Sen --------------------------------------------------------

  test("theilSen: exact linear trend recovered, immune to one outlier day") {
    // daily revenue = 10.00 + 2.00·t dollars over 30 days
    def day(t: Int) = java.sql.Timestamp.valueOf(f"2024-06-${t + 1}%02d 00:00:00")
    val lin = (0 until 30).map(t => (day(t), 10.0 + 2.0 * t))
    val clean = operators.Analytics.theilSen(
      lin.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(clean.getAs[Long]("n_days") === 30L)
    assert(clean.getAs[Long]("n_pairs") === 435L)
    assert(math.abs(clean.getAs[Double]("slope_dollars_per_day") - 2.0) < 1e-9)
    // one flash-sale day 1000x the trend leaves the median slope at 2
    val dirty = lin.updated(15, (day(15), 40000.0))
    val r = operators.Analytics.theilSen(
      dirty.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(math.abs(r.getAs[Double]("slope_dollars_per_day") - 2.0) < 1e-9)
  }

  test("theilSen: negative slopes floor-divide identically to the oracle") {
    def day(t: Int) = java.sql.Timestamp.valueOf(f"2024-06-${t + 1}%02d 00:00:00")
    // y = 100 - 3.33·t: slopes are negative non-integers -> exercises the
    // shifted floor division on negative dividends
    val rows = (0 until 10).map(t => (day(t), 100.0 - 3.33 * t))
    val r = operators.Analytics.theilSen(rows.toDF("o_orderdate", "o_totalprice"))
      .collect()(0)
    assert(math.abs(r.getAs[Double]("slope_dollars_per_day") - -3.33) < 1e-4)
  }

  // ---- count-min --------------------------------------------------------

  test("countMin: estimates are one-sided and exact top key surfaces first") {
    val items = (Seq.fill(50)(7L) ++ Seq.fill(20)(3L) ++
      (100L to 160L)).toDF("l_partkey")
    val rows = operators.Sketches.countMin(items, "l_partkey", k = 5).collect()
    assert(rows.head.getAs[Long]("key") === 7L)
    assert(rows.head.getAs[Long]("exact_cnt") === 50L)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"))
      assert(r.getAs[Long]("overestimate") >= 0L)
    }
  }

  test("countMin: with few keys and wide rows the estimate is exact") {
    // 3 keys into 4x512 cells: collision probability ~0; min over 4 rows
    // must equal the exact count.
    val items = (Seq.fill(9)(1L) ++ Seq.fill(5)(2L) ++ Seq.fill(2)(3L))
      .toDF("l_partkey")
    val rows = operators.Sketches.countMin(items, "l_partkey", k = 3).collect()
    assert(rows.forall(r => r.getAs[Long]("overestimate") === 0L))
    assert(rows.map(r => r.getAs[Long]("exact_cnt")).toSeq === Seq(9L, 5L, 2L))
  }

  // ---- NDCG / MRR -------------------------------------------------------

  test("ndcgEval: an index that agrees with brute force scores NDCG=MRR=1") {
    // all vectors share the first-8-dim sign pattern -> one LSH bucket ->
    // the candidate ranking IS the brute ranking.
    val emb = (0 until 12).map { i =>
      val v = Array.fill(64)(0.1f)
      v(10) = 1.0f - i * 0.05f // separates ranks deterministically
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = operators.Similarity.ndcgEval(spark, emb).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") === 10L)
      assert(math.abs(r.getAs[Double]("ndcg_at_10") - 1.0) < 1e-6)
      assert(math.abs(r.getAs[Double]("mrr") - 1.0) < 1e-6)
    }
  }

  test("ndcgEval: burying the best documents costs NDCG") {
    // query 0's true nearest neighbors (identical tail, flipped first-8
    // signs) live in the OPPOSITE sign bucket; its own bucket holds only
    // near-orthogonal fillers -> few hits, low NDCG. The query itself
    // stays ideal-top-1 and candidate-top-1, so MRR remains 1 — the
    // graded metric is what exposes the miss.
    val q = {
      val v = Array.fill(64)(0.1f); v(32) = 1.0f
      Seq((0L, v.toSeq))
    }
    val strong = (1 until 8).map { i =>
      val v = Array.fill(64)(0.1f); v(32) = 1.0f - 0.001f * i
      (0 until 8).foreach(d => v(d) = -0.1f) // flips the LSH bucket only
      (i.toLong, v.toSeq)
    }
    val weak = (8 until 14).map { i =>
      val v = Array.tabulate(64)(d => if (d % 2 == 0) 0.1f else -0.1f)
      (0 until 8).foreach(d => v(d) = 0.1f) // same bucket as the query
      v(35) = 0.001f * i
      (i.toLong, v.toSeq)
    }
    val emb = (q ++ strong ++ weak).toDF("vec_id", "embedding")
    val r = operators.Similarity.ndcgEval(spark, emb)
      .filter(col("query_id") === 0).collect()(0)
    assert(r.getAs[Long]("n_hits") < 10L)
    assert(r.getAs[Double]("ndcg_at_10") < 0.6)
    assert(math.abs(r.getAs[Double]("mrr") - 1.0) < 1e-6)
  }

  // ---- linear CKA -------------------------------------------------------

  test("ckaQuant: int8 quantization preserves geometry (CKA near 1)") {
    val emb = (0 until 40).map { i =>
      val v = Array.tabulate(64)(d =>
        (math.sin(0.1 * (i + 1) * (d + 1)) * 0.4).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val r = operators.Training.ckaQuant(emb).collect()(0)
    assert(r.getAs[Long]("n_vecs") === 40L)
    assert(r.getAs[Long]("dims") === 64L)
    assert(r.getAs[Double]("cka") > 0.99 && r.getAs[Double]("cka") <= 1.0 + 1e-9)
  }

  test("ckaQuant: a constant corpus has no geometry — CKA is null, not NaN") {
    val emb = (0 until 5).map(i =>
      (i.toLong, Seq.fill(64)(0.25f))).toDF("vec_id", "embedding")
    val r = operators.Training.ckaQuant(emb).collect()(0)
    assert(r.isNullAt(r.fieldIndex("cka")))
  }
}
