package graft

import org.apache.spark.sql.functions._

/** Hand-computed gates for the round-10 batch-B operators:
  * Hodges–Lehmann / Mann–Whitney, Cochran–Armitage trend, GPD tail fit,
  * sharp RDD, two-component GMM EM, and fixed-period harmonic power.
  */
class Round10cSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00")

  // ---- Hodges–Lehmann / Mann–Whitney -------------------------------------

  test("hodgesLehmann: planted $5 day shift is the exact pairwise median") {
    // click day totals {10,20,30}, purchase day totals {15,25,35} dollars:
    // 9 pairwise diffs, exact type-1 median = +$5.00
    val ev = Seq(
      (ts(0), "click", 10.0), (ts(1), "click", 20.0), (ts(2), "click", 30.0),
      (ts(0), "purchase", 15.0), (ts(1), "purchase", 25.0),
      (ts(2), "purchase", 35.0)).toDF("ts", "event_type", "value")
    val r = operators.Analytics.hodgesLehmann(ev).collect()(0)
    assert(r.getAs[Long]("n_x") === 3L)
    assert(r.getAs[Long]("n_y") === 3L)
    assert(r.getAs[Long]("n_pairs") === 9L)
    assert(math.abs(r.getAs[Double]("hl_shift_dollars") - 5.0) < 1e-9)
    // separated samples: x ranks {2,4,6} doubled -> U = (4+8+12)/2? gate
    // the direction instead: purchases rank above clicks -> U > n1*n2/2
    assert(r.getAs[Double]("u_stat") > 4.5)
  }

  // ---- Cochran–Armitage ---------------------------------------------------

  test("cochranArmitage: planted monotone dose-response trends positive") {
    // return rate 10% at dose 1 rising to 90% at dose 5
    val rows = (1 to 5).flatMap { dose =>
      val q = (dose - 1) * 10 + 5 // quantity inside the dose bucket
      (1 to 100).map(i =>
        (q.toDouble, if (i <= dose * 20 - 10) "R" else "N"))
    }
    val r = operators.Analytics
      .cochranArmitage(rows.toDF("l_quantity", "l_returnflag")).collect()(0)
    assert(r.getAs[Long]("k_doses") === 5L)
    assert(r.getAs[Double]("z") > 5.0)
    assert(r.getAs[Double]("p_value") < 1e-6)
  }

  test("cochranArmitage: flat rates give |z| near zero") {
    val rows = (1 to 5).flatMap { dose =>
      val q = (dose - 1) * 10 + 5
      (1 to 100).map(i => (q.toDouble, if (i <= 30) "R" else "N"))
    }
    val r = operators.Analytics
      .cochranArmitage(rows.toDF("l_quantity", "l_returnflag")).collect()(0)
    assert(math.abs(r.getAs[Double]("z")) < 1e-9)
  }

  // ---- GPD tail ------------------------------------------------------------

  test("tailGpd: hand-computed MOM fit on the 1..100-cent ladder") {
    // values 1..100 cents: u = 95 (type-1 p95), excesses {1..5}:
    // m = 3, s² = 2.5, r = 3.6 -> ξ = -1.3, β = 0.5·3·4.6 = 6.9 cents
    val orders = (1 to 100).map(c => c / 100.0).toDF("o_totalprice")
    val r = operators.Analytics.tailGpd(orders).collect()(0)
    assert(r.getAs[Long]("n_total") === 100L)
    assert(math.abs(r.getAs[Double]("threshold_dollars") - 0.95) < 1e-9)
    assert(r.getAs[Long]("n_exceed") === 5L)
    assert(math.abs(r.getAs[Double]("mean_excess_dollars") - 0.03) < 1e-9)
    assert(math.abs(r.getAs[Double]("xi") - -1.3) < 1e-6)
    assert(math.abs(r.getAs[Double]("beta_dollars") - 0.069) < 1e-6)
  }

  // ---- RDD -----------------------------------------------------------------

  test("rdd: planted $500 jump at the cutoff with $10/qty slopes") {
    // price = 10·qty dollars, +$500 for qty >= 26; 20 rows per level
    val rows = (11 to 40).flatMap { q =>
      val price = 10.0 * q + (if (q >= 26) 500.0 else 0.0)
      (1 to 20).map(_ => (q.toDouble, price))
    }
    val r = operators.Analytics
      .rdd(rows.toDF("l_quantity", "l_extendedprice")).collect()(0)
    assert(r.getAs[Long]("n_left") === 300L)
    assert(r.getAs[Long]("n_right") === 300L)
    assert(math.abs(r.getAs[Double]("jump_dollars") - 500.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("slope_left_per_qty") - 10.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("slope_right_per_qty") - 10.0) < 1e-6)
    // intercepts sit AT the cutoff (qty 25.5): left 255, right 755
    assert(math.abs(r.getAs[Double]("y_left_dollars") - 255.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("y_right_dollars") - 755.0) < 1e-6)
  }

  // ---- GMM EM ----------------------------------------------------------------

  test("gmmDaily: two planted revenue regimes are recovered") {
    def day(i: Int) = {
      val c = java.util.Calendar.getInstance()
      c.set(2024, 0, 1, 0, 0, 0)
      c.add(java.util.Calendar.DAY_OF_MONTH, i)
      new java.sql.Timestamp(c.getTimeInMillis)
    }
    // 20 slow days near $100, 20 busy days near $1000 (one order per day)
    val rows = (0 until 20).map(i => (day(i), 100.0 + i * 0.01)) ++
      (20 until 40).map(i => (day(i), 1000.0 + i * 0.01))
    val r = operators.Analytics
      .gmmDaily(rows.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(r.getAs[Long]("n_days") === 40L)
    assert(r.getAs[Double]("pi_lo") > 0.4 && r.getAs[Double]("pi_lo") < 0.6)
    assert(r.getAs[Double]("mu_lo_dollars") < 200.0)
    assert(r.getAs[Double]("mu_hi_dollars") > 800.0)
    assert(r.getAs[Double]("sigma_lo_dollars") < 50.0)
    assert(r.getAs[Double]("sigma_hi_dollars") < 50.0)
  }

  test("gmmDaily: a one-regime corpus survives (no ANSI 0/0 in M-steps)") {
    def day(i: Int) = {
      val c = java.util.Calendar.getInstance()
      c.set(2024, 0, 1, 0, 0, 0)
      c.add(java.util.Calendar.DAY_OF_MONTH, i)
      new java.sql.Timestamp(c.getTimeInMillis)
    }
    // near-constant revenue: one component absorbs everything and the
    // other's mass -> 0; the safe denominators must keep EM finite
    val rows = (0 until 10).map(i => (day(i), 500.0 + 0.01 * i))
    val r = operators.Analytics
      .gmmDaily(rows.toDF("o_orderdate", "o_totalprice")).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_days") === 10L)
  }

  // ---- harmonic power ---------------------------------------------------------

  test("harmonicPower: a pure weekly sinusoid loads period 7, not 30") {
    def day(i: Int) = {
      val c = java.util.Calendar.getInstance()
      c.set(2024, 0, 1, 0, 0, 0)
      c.add(java.util.Calendar.DAY_OF_MONTH, i)
      new java.sql.Timestamp(c.getTimeInMillis)
    }
    val rows = (0 until 210).map { t =>
      (day(t), 1000.0 + 100.0 * math.cos(2 * math.Pi * t / 7))
    }
    val m = operators.Analytics
      .harmonicPower(rows.toDF("o_orderdate", "o_totalprice")).collect()
      .map(r => r.getAs[Int]("period") -> r.getAs[Double]("var_share"))
      .toMap
    assert(m(7) > 0.95)
    assert(m(30) < 0.02)
  }
}
