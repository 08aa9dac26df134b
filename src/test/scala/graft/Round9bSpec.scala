package graft

import org.apache.spark.sql.functions._

/** Round-9 continuation operators on PLANTED data (known-answer gates the
  * natural corpus can't provide — the r8 lesson).
  */
class Round9bSpec extends SparkSpec {
  import spark.implicits._

  test("kruskalWallis: textbook two-group separation, no ties") {
    // {1,2,3} vs {4,5,6}: R1=6, R2=15 → H = 12/42·(36/3+225/3) − 21
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6))
      .toDF("g", "v")
    val r = operators.Analytics.kruskalWallis(df, "g", col("v")).collect()(0)
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(r.getAs[Long]("n_rows") === 6L)
    assert(math.abs(r.getAs[Double]("h_stat") - 3.857143) < 1e-5)
    // no ties → correction is a no-op
    assert(r.getAs[Double]("h_tie_adj") === r.getAs[Double]("h_stat"))
  }

  test("kruskalWallis: tie correction inflates H by exactly 1/C") {
    // every value duplicated once → tie = 3·(2³−2) = 18, C = 1 − 18/210
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 2), ("b", 3), ("b", 3))
      .toDF("g", "v")
    val r = operators.Analytics.kruskalWallis(df, "g", col("v")).collect()(0)
    assert(math.abs(r.getAs[Double]("h_stat") - 3.047619) < 1e-5)
    assert(math.abs(r.getAs[Double]("h_tie_adj") - 3.333333) < 1e-5)
  }

  test("brownForsythe: known-answer W on a planted variance gap") {
    // A = {1,1,1} (zero spread), B = {0,10,20}: z2_A = {0,0,0},
    // z2_B = {20,0,20} → one-way F on z2 = 4.0 exactly
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 0), ("b", 10), ("b", 20))
      .toDF("g", "v")
    val r = operators.Analytics.brownForsythe(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("k_groups") === 2L)
    assert(math.abs(r.getAs[Double]("w_stat") - 4.0) < 1e-9)
  }

  test("grangerDaily: recovers a planted cnt→next-day-revenue effect") {
    // rev_t = 50·cnt_{t−1} + (t mod 3): the count lag carries ~all signal
    // (offline lstsq: b2 = 49.9152, F ≈ 1.1e5; rev-lag beta ≈ −0.0017)
    val t0 = java.time.LocalDate.of(2020, 1, 1)
    val cnt = (0 until 20).map(t => (t * 7) % 5 + 1)
    val rev = 100 +: (1 until 20).map(t => 50 * cnt(t - 1) + t % 3)
    val rows = for {
      t <- 0 until 20
      i <- 0 until cnt(t)
      price = if (i == 0) (rev(t) - (cnt(t) - 1)).toDouble else 1.0
    } yield (t0.plusDays(t).toString + " 00:00:00", price)
    val orders = rows.toDF("ds", "o_totalprice")
      .select(to_timestamp(col("ds")).as("o_orderdate"), col("o_totalprice"))
    val r = operators.Analytics.grangerDaily(orders).collect()(0)
    assert(r.getAs[Long]("n_days") === 19L)
    assert(math.abs(r.getAs[Double]("beta_cnt_lag") - 49.9152) < 0.01)
    assert(math.abs(r.getAs[Double]("beta_rev_lag")) < 0.01)
    assert(r.getAs[Double]("f_stat") > 1000.0)
  }

  test("grangerDaily: an exact AR fit (zero residual) yields null F, not ∞") {
    // rev_t = rev_{t−1} exactly → RSS_full = 0 → guarded null
    val t0 = java.time.LocalDate.of(2020, 1, 1)
    val rows = (0 until 10).map(t => (t0.plusDays(t).toString + " 00:00:00", 100.0))
    val orders = rows.toDF("ds", "o_totalprice")
      .select(to_timestamp(col("ds")).as("o_orderdate"), col("o_totalprice"))
    val r = operators.Analytics.grangerDaily(orders).collect()(0)
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }
}
