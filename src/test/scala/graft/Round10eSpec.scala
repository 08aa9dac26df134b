package graft

import org.apache.spark.sql.functions._

/** Hand-computed gates for the round-10 batch-D operators: Jarque–Bera,
  * IV/Wald, Bass diffusion, LOF, and Burrows' Delta.
  */
class Round10eSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = {
    val c = java.util.Calendar.getInstance()
    c.set(2024, 0, 1, 0, 0, 0)
    c.add(java.util.Calendar.DAY_OF_MONTH, i)
    new java.sql.Timestamp(c.getTimeInMillis)
  }

  // ---- Jarque–Bera --------------------------------------------------------

  test("jarqueBera: symmetric 4-day ladder computes the textbook JB") {
    // daily dollars {10,20,20,30}: dv = {-10,0,0,10}, skew 0,
    // kurt_excess = 5000/2500 - 3 = -1, JB = 4/6 * (0 + 1/4) = 1/6
    val rows = Seq((day(0), 10.0), (day(1), 20.0), (day(2), 20.0),
      (day(3), 30.0))
    val r = operators.Analytics
      .jarqueBera(rows.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(r.getAs[Long]("n_days") === 4L)
    assert(math.abs(r.getAs[Double]("skewness")) < 1e-9)
    assert(math.abs(r.getAs[Double]("kurtosis_excess") - -1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("jb_stat") - 1.0 / 6) < 1e-6)
    assert(math.abs(r.getAs[Double]("p_value") -
      math.exp(-1.0 / 12)) < 1e-5)
  }

  // ---- IV / Wald -----------------------------------------------------------

  test("ivWald: perfect compliance recovers the planted $50 LATE") {
    // discover each candidate user's md5 arm with the operator's own
    // hash, then plant: encouraged users are heavy clickers who spend
    // $100; control users click once and spend $50.
    val ids = (1L to 60L).toDF("user_id")
    val armCol = when(
      conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 2 === 0, 0L).otherwise(1L)
    val arms = ids.select(col("user_id"), armCol.as("z")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = arms.toSeq.flatMap { case (u, z) =>
      val clicks = if (z == 1) 12 else 1
      val spend = if (z == 1) 100.0 else 50.0
      (1 to clicks).map(i => (u, "click", 1.0, day(i % 20))) :+
        ((u, "purchase", spend, day(25)))
    }
    val r = operators.Analytics
      .ivWald(rows.toDF("user_id", "event_type", "value", "ts"))
      .collect()(0)
    assert(!r.getAs[Boolean]("weak_instrument"))
    assert(math.abs(r.getAs[Double]("first_stage") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("late_dollars") - 50.0) < 1e-6)
  }

  // ---- Bass diffusion --------------------------------------------------------

  test("bassDiffusion: a generated S-curve recovers p, q, m") {
    // simulate n_t = p*m + (q-p)*N - (q/m)*N^2 with p=.03, q=.38, m=1000
    val (p, q, m) = (0.03, 0.38, 1000.0)
    var n = 0.0
    var cust = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp)]()
    var t = 0
    while (n < 0.95 * m && t < 60) {
      val nt = math.max(1, math.round(p * m + (q - p) * n - q / m * n * n))
      (1L to nt).foreach { _ =>
        cust += 1
        rows += ((cust, day(t)))
      }
      n += nt
      t += 1
    }
    val r = operators.Analytics
      .bassDiffusion(rows.toSeq.toDF("o_custkey", "o_orderdate"))
      .collect()(0)
    val mkt = r.getAs[Double]("market_size")
    assert(mkt > 800 && mkt < 1200)
    assert(r.getAs[Double]("innovation_p") > 0.01 &&
      r.getAs[Double]("innovation_p") < 0.06)
    assert(r.getAs[Double]("imitation_q") > 0.2 &&
      r.getAs[Double]("imitation_q") < 0.6)
  }

  // ---- LOF --------------------------------------------------------------------

  test("lofOutliers: the lone point off a tight cluster tops the ranking") {
    val cluster = (0 until 20).map { i =>
      val v = Array.tabulate(64)(d => 0.3f + 0.001f * ((i + d) % 7))
      (i.toLong, v.toSeq)
    }
    val outlier = {
      val v = Array.fill(64)(0.3f); v(0) = -0.9f; v(1) = -0.9f
      Seq((99L, v.toSeq))
    }
    val rows = operators.Training
      .lofOutliers((cluster ++ outlier).toDF("vec_id", "embedding"))
      .collect()
    assert(rows.head.getAs[Long]("vec_id") === 99L)
    assert(rows.head.getAs[Double]("lof") > 2.0)
    // cluster members sit at LOF ~ 1
    assert(rows.last.getAs[Double]("lof") < 1.5)
  }

  // ---- Croston ------------------------------------------------------------

  test("croston: hand-computed size/interval EWMAs on a 3-demand series") {
    // demands 10, 20, 30 on days 0, 2, 6 (alpha = 0.1):
    // Z = .81*10 + .09*20 + .1*30 = 12.9 ; P = .9*2 + .1*4 = 2.2
    val rows = Seq((7L, 10.0, day(0)), (7L, 20.0, day(2)), (7L, 30.0, day(6)))
      .toDF("l_partkey", "l_quantity", "l_shipdate")
    val r = operators.Analytics.croston(rows).collect()(0)
    assert(r.getAs[Long]("part") === 7L)
    assert(r.getAs[Long]("n_demands") === 3L)
    assert(math.abs(r.getAs[Double]("mean_interval_days") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("size_ewma") - 12.9) < 1e-6)
    assert(math.abs(r.getAs[Double]("interval_ewma") - 2.2) < 1e-6)
    assert(math.abs(r.getAs[Double]("croston_forecast") - 12.9 / 2.2) < 1e-6)
    assert(math.abs(r.getAs[Double]("sba_forecast") -
      0.95 * 12.9 / 2.2) < 1e-6)
  }

  test("croston: a single demand event yields null forecasts, no divide") {
    val rows = Seq((7L, 10.0, day(0)))
      .toDF("l_partkey", "l_quantity", "l_shipdate")
    val r = operators.Analytics.croston(rows).collect()(0)
    assert(r.getAs[Long]("n_demands") === 1L)
    assert(r.isNullAt(r.fieldIndex("croston_forecast")))
    assert(r.isNullAt(r.fieldIndex("mean_interval_days")))
  }

  // ---- Mann–Kendall ----------------------------------------------------

  test("mannKendall: a rising month is 'increasing', a flat one 'none'") {
    val rising = (0 until 30).map(t => (day(t), 100.0 + t))
    val r = operators.Analytics
      .mannKendall(rising.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(r.getAs[Long]("s_stat") === 435L) // all 30*29/2 pairs concordant
    assert(r.getAs[String]("trend") === "increasing")
    assert(r.getAs[Double]("p_value") < 1e-6)
    // constant series: every pair ties -> variance 0 -> no verdict
    val flat = (0 until 30).map(t => (day(t), 100.0))
    val f = operators.Analytics
      .mannKendall(flat.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(f.getAs[Long]("s_stat") === 0L)
    assert(f.getAs[String]("trend") === "none")
    assert(f.isNullAt(f.fieldIndex("z")))
  }

  // ---- Pettitt ------------------------------------------------------------

  test("pettitt: a planted level shift is dated at the regime boundary") {
    val rows = (0 until 40).map(t => (day(t), 100.0 + 0.01 * t)) ++
      (40 until 80).map(t => (day(t), 200.0 + 0.01 * t))
    val r = operators.Analytics
      .pettitt(rows.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(r.getAs[Long]("n_days") === 80L)
    val expected = new java.sql.Date(day(39).getTime).toString
    assert(r.getAs[java.sql.Date]("change_date").toString === expected)
    assert(r.getAs[Double]("p_value") < 0.001)
  }

  // ---- James–Stein shrinkage -----------------------------------------

  test("jamesStein: a 2-of-2 outlier shrinks hard toward the prior mean") {
    // 50 well-measured parts at rate 1/3 (n=30) + one n=2, x=2 part
    val stable = (1 to 50).flatMap { p =>
      (1 to 30).map(i => (p.toLong, if (i <= 10) "R" else "N"))
    }
    val outlier = Seq((99L, "R"), (99L, "R"))
    val rows = operators.Analytics
      .jamesStein((stable ++ outlier).toDF("l_partkey", "l_returnflag"))
      .collect()
    val top = rows.head
    assert(top.getAs[Long]("part") === 99L)
    assert(top.getAs[Double]("raw_rate") === 1.0)
    // shrunk far toward 1/3, never past it, and still above it
    assert(top.getAs[Double]("shrunk_rate") < 0.6)
    assert(top.getAs[Double]("shrunk_rate") > 1.0 / 3)
  }

  // ---- Hurst exponent ----------------------------------------------------

  test("hurst: a trending series is persistent, an alternating one is not") {
    val trend = (0 until 256).map(t => (day(t), 100.0 + 10.0 * t))
    val hTrend = operators.Analytics
      .hurst(trend.toDF("o_orderdate", "o_totalprice")).collect()(0)
      .getAs[Double]("hurst")
    assert(hTrend > 0.8)
    val alt = (0 until 256).map(t =>
      (day(t), if (t % 2 == 0) 100.0 else 200.0))
    val hAlt = operators.Analytics
      .hurst(alt.toDF("o_orderdate", "o_totalprice")).collect()(0)
      .getAs[Double]("hurst")
    assert(hAlt < 0.3)
  }

  // ---- Dunning G² collocations -----------------------------------------

  test("collocationsG2: a fixed phrase beats a one-count PMI dazzler") {
    // "new york" co-occurs 8x amid varied text; "aa bb" occurs once with
    // both words unique (PMI would rank it top; G² must not).
    val filler = (1 to 8).map(i =>
      (i.toLong, s"new york w$i x$i y$i z$i", "s"))
    val rare = Seq((9L, "aa bb", "s"))
    val docs = (filler ++ rare).toDF("doc_id", "text", "source")
    val rows = operators.TextAnalysis.collocationsG2(docs).collect()
    assert(rows.head.getString(0) === "new")
    assert(rows.head.getString(1) === "york")
    assert(rows.head.getAs[Long]("n_pair") === 8L)
    val aabb = rows.find(r => r.getString(0) == "aa").get
    assert(aabb.getAs[Double]("g2") < rows.head.getAs[Double]("g2"))
  }

  // ---- Burrows' Delta ------------------------------------------------------------

  test("burrowsDelta: stylistic twins are the closest pair") {
    def doc(id: Long, src: String, text: String) = (id, text, src)
    // A and B share a function-word style; C inverts it
    val styleAB = "the the the of of and to in a cat sat mat"
    val styleC = "zz zz zz qq qq ww ee rr tt yy uu ii"
    val docs = (
      (1 to 5).map(i => doc(i, "srcA", styleAB + s" extra$i")) ++
        (6 to 10).map(i => doc(i, "srcB", styleAB + s" other$i")) ++
        (11 to 15).map(i => doc(i, "srcC", styleC + s" unique$i"))
      ).toDF("doc_id", "text", "source")
    val rows = operators.TextAnalysis.burrowsDelta(docs).collect()
    val top = (rows.head.getAs[String]("s1"), rows.head.getAs[String]("s2"))
    assert(top === ("srcA", "srcB"))
    assert(rows.head.getAs[Double]("delta") <
      rows.last.getAs[Double]("delta"))
  }
}
