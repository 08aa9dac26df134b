package graft

import org.apache.spark.sql.functions._

/** Session-5 round-9 operators on PLANTED data: McNemar, the Fisher
  * randomization test, CEM ATT, linear-kernel MMD, and Newman modularity.
  */
class Round9cSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = f"2024-01-01 $h%02d:00:00"

  test("mcnemar: hand-built 2x2 disagreement table and Edwards chi2") {
    // truth = purchase. A = value>50, B = even hour.
    // row1: purchase, 60, h0  -> A right, B right   (both_correct)
    // row2: purchase, 40, h0  -> A wrong, B right   (b_only)
    // row3: click,    60, h1  -> A wrong, B wrong?  A says T vs truth F ->
    //       wrong; B: odd hour -> pred F = truth F -> right  (b_only)
    // row4: click,    40, h1  -> A right, B right   (both_correct)
    // row5: click,    60, h0  -> A wrong, B wrong   (both_wrong)
    // row6: purchase, 60, h1  -> A right, B wrong   (a_only)
    val ev = Seq(
      (1L, "purchase", 60.0, ts(0)), (2L, "purchase", 40.0, ts(0)),
      (3L, "click", 60.0, ts(1)), (4L, "click", 40.0, ts(1)),
      (5L, "click", 60.0, ts(0)), (6L, "purchase", 60.0, ts(1)))
      .toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.mcnemar(ev).collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("both_correct") === 2L)
    assert(r.getAs[Long]("a_only") === 1L)
    assert(r.getAs[Long]("b_only") === 2L)
    assert(r.getAs[Long]("both_wrong") === 1L)
    assert(math.abs(r.getAs[Double]("acc_a") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("acc_b") - 4.0 / 6) < 1e-6)
    // chi2 = (|1-2|-1)^2 / 3 = 0
    assert(r.getAs[Double]("mcnemar_chi2") === 0.0)
  }

  test("mcnemar: zero-disagreement pair yields null chi2, not a throw") {
    // identical predictions: value>50 XNOR even-hour on every row
    val ev = Seq((1L, "purchase", 60.0, ts(0)), (2L, "click", 40.0, ts(1)))
      .toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.mcnemar(ev).collect()(0)
    assert(r.getAs[Long]("a_only") === 0L && r.getAs[Long]("b_only") === 0L)
    assert(r.isNullAt(r.fieldIndex("mcnemar_chi2")))
  }

  test("randomizationTest: planted HUGE gap is never matched by chance") {
    // purchases at 1000.00, clicks at 1.00 — no Bernoulli relabeling of a
    // balanced sample reproduces a 999 gap, so only the d_obs itself can
    // be extreme and p bottoms out at its floor 1/(B+1).
    val ev = (1L to 40L).map { i =>
      if (i <= 20) (i, "purchase", 1000.0, ts((i % 24).toInt))
      else (i, "click", 1.0, ts((i % 24).toInt))
    }.toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.randomizationTest(ev).collect()(0)
    assert(r.getAs[Long]("n_treat") === 20L)
    assert(r.getAs[Long]("n_ctrl") === 20L)
    assert(math.abs(r.getAs[Double]("diff_obs") - 999.0) < 1e-6)
    assert(r.getAs[Long]("b_reps") === 48L)
    assert(r.getAs[Long]("n_extreme") === 0L)
    assert(math.abs(r.getAs[Double]("p_value") - 1.0 / 49) < 1e-6)
  }

  test("randomizationTest: a null effect is not declared significant") {
    // both groups drawn from the same constant — every replicate diff is
    // 0 = |d_obs|, so every replicate is 'extreme' and p = 1
    val ev = (1L to 30L).map { i =>
      (i, if (i % 2 == 0) "purchase" else "click", 7.0, ts(3))
    }.toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.randomizationTest(ev).collect()(0)
    assert(r.getAs[Double]("diff_obs") === 0.0)
    assert(r.getAs[Double]("p_value") === 1.0)
  }

  test("cemAtt: stratum reweighting removes a planted confounder") {
    // Two strata with opposite outcome levels; treatment concentrates in
    // the high-outcome stratum, so the naive diff is inflated. Within
    // each stratum the true effect is exactly +10.
    // Stratum O/20241 (status O, 2024 Q1): treated 110 ×3, control 100 ×1
    // Stratum F/20241: treated 30 ×1, control 20 ×3
    def row(pri: String, st: String, day: String, price: Double) =
      (pri, st, java.sql.Date.valueOf(day), price)
    val orders = Seq(
      row("1-URGENT", "O", "2024-01-05", 110.0),
      row("1-URGENT", "O", "2024-01-06", 110.0),
      row("2-HIGH", "O", "2024-02-07", 110.0),
      row("5-LOW", "O", "2024-03-08", 100.0),
      row("1-URGENT", "F", "2024-01-09", 30.0),
      row("5-LOW", "F", "2024-02-10", 20.0),
      row("5-LOW", "F", "2024-02-11", 20.0),
      row("5-LOW", "F", "2024-03-12", 20.0))
      .toDF("o_orderpriority", "o_orderstatus", "o_orderdate", "o_totalprice")
    val r = operators.Analytics.cemAtt(orders).collect()(0)
    assert(r.getAs[Long]("n_strata") === 2L)
    assert(r.getAs[Long]("n_strata_matched") === 2L)
    assert(r.getAs[Long]("n_treated") === 4L)
    assert(r.getAs[Long]("n_control") === 4L)
    // ATT: treated mean = (330+30)/4 = 90; weighted control =
    // (3·100/1 + 1·60/3)/4 = 320/4 = 80 -> +10 exactly
    assert(math.abs(r.getAs[Double]("att") - 10.0) < 1e-4)
    // naive: 90 − (100+60)/4 = 90 − 40 = +50 — the confounded estimate
    assert(math.abs(r.getAs[Double]("naive_diff") - 50.0) < 1e-6)
  }

  test("mmdDrift: identical populations give 0, a planted shift its norm") {
    val mk = (id: Long, lab: Int, v: Seq[Float]) => (id, v, lab)
    // ref (label 0) and cur (label 9) both = {(1,0),(0,1)} -> means equal
    val same = Seq(
      mk(1, 0, Seq(1f, 0f)), mk(2, 0, Seq(0f, 1f)),
      mk(3, 9, Seq(1f, 0f)), mk(4, 9, Seq(0f, 1f)))
      .toDF("vec_id", "embedding", "label")
    val r0 = operators.Similarity.mmdDrift(same, col("label") < 5).collect()(0)
    assert(r0.getAs[Long]("n_ref") === 2L && r0.getAs[Long]("n_cur") === 2L)
    assert(r0.getAs[Long]("n_dims") === 2L)
    assert(r0.getAs[Double]("mmd2") === 0.0)
    // shift cur by +0.5 in dim 0: mmd2 = 0.25, stat = (2·2/4)·0.25
    val shifted = Seq(
      mk(1, 0, Seq(1f, 0f)), mk(2, 0, Seq(0f, 1f)),
      mk(3, 9, Seq(1.5f, 0f)), mk(4, 9, Seq(0.5f, 1f)))
      .toDF("vec_id", "embedding", "label")
    val r1 = operators.Similarity.mmdDrift(shifted, col("label") < 5)
      .collect()(0)
    assert(math.abs(r1.getAs[Double]("mmd2") - 0.25) < 1e-9)
    assert(math.abs(r1.getAs[Double]("stat_neff") - 0.25) < 1e-9)
  }

  test("shuffleQuality: exact random-permutation expectation on counts") {
    // sources a×3, b×2 -> exp = (3·2 + 2·1)/(5·4) = 0.4 exactly
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("doc_id", "source")
    val out = operators.Training.shuffleQuality(docs).collect()
    assert(out.length === 2) // one row per epoch
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") === 5L)
      assert(math.abs(r.getAs[Double]("exp_rate") - 0.4) < 1e-9)
      val pairs = r.getAs[Long]("n_pairs")
      assert(pairs >= 0L && pairs <= 4L) // ≥1 shard splits the chain
      assert(r.getAs[Long]("same_src_pairs") <= pairs)
    }
  }

  test("aucDelongCi: perfect separation collapses the CI to a point") {
    val df = Seq((3L, true), (4L, true), (1L, false), (2L, false))
      .toDF("score", "en")
    val r = operators.Analytics
      .aucDelongCi(df, col("score"), col("en")).collect()(0)
    assert(r.getAs[Long]("n_pos") === 2L && r.getAs[Long]("n_neg") === 2L)
    assert(r.getAs[Double]("auc") === 1.0)
    assert(r.getAs[Double]("se_delong") === 0.0)
    assert(r.getAs[Double]("ci_lo") === 1.0)
    assert(r.getAs[Double]("ci_hi") === 1.0)
  }

  test("aucDelongCi: hand-computed placements on an overlapping pair") {
    // pos {2,3}, neg {1,2}: V10 = {0.75, 1}, V01 = {1, 0.75}
    // AUC = 0.875, S10 = S01 = 0.03125, se = sqrt(0.03125/2·2) = 0.176777
    val df = Seq((2L, true), (3L, true), (1L, false), (2L, false))
      .toDF("score", "en")
    val r = operators.Analytics
      .aucDelongCi(df, col("score"), col("en")).collect()(0)
    assert(math.abs(r.getAs[Double]("auc") - 0.875) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_delong") - 0.176777) < 1e-6)
    assert(math.abs(r.getAs[Double]("ci_lo") - (0.875 - 1.959964 * 0.1767767)) < 1e-5)
  }

  test("cooccurPmi: window-3 pairs on a planted trigram corpus") {
    // 'a b c' ×3: unordered window-3 pairs (a,b),(a,c),(b,c) each ×3;
    // Nu = 9, Np = 9, every unigram 3 -> PMI = log2(3) for all pairs
    val docs = (1 to 3).map(i => (i.toLong, "a b c"))
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.cooccurPmi(docs).collect()
    assert(out.length === 3)
    assert(out.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")))
      .toSeq === Seq(("a", "b"), ("a", "c"), ("b", "c")))
    out.foreach { r =>
      assert(r.getAs[Long]("cb") === 3L)
      assert(math.abs(r.getAs[Double]("pmi") - 1.584963) < 1e-6)
    }
  }

  test("cooccurPmi: distance-4 tokens never pair") {
    // 'x a a a y' ×3: (x,y) is 4 apart -> absent; (a,a) self-pairs exist
    val docs = (1 to 3).map(i => (i.toLong, "x a a a y")).toDF("doc_id", "text")
    val out = operators.TextAnalysis.cooccurPmi(docs).collect()
    assert(!out.exists(r =>
      r.getAs[String]("w1") === "x" && r.getAs[String]("w2") === "y"))
  }

  test("calinskiHarabasz: two planted separated pairs give CH = 200") {
    // label 0: x={0,1}, label 1: x={10,11} (dim1 all 0):
    // W = 0.5+0.5 = 1, B = 101−1 = 100, CH = (100/1)/(1/2) = 200
    val emb = Seq(
      (1L, Seq(0f, 0f), 0), (2L, Seq(1f, 0f), 0),
      (3L, Seq(10f, 0f), 1), (4L, Seq(11f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = operators.Similarity.calinskiHarabasz(emb).collect()(0)
    assert(r.getAs[Long]("k") === 2L)
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(math.abs(r.getAs[Double]("w_ss") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("b_ss") - 100.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("ch_index") - 200.0) < 1e-3)
  }

  test("rakeKeywords: stopword-delimited phrases score deg/freq sums") {
    // 'red apple and green apple' x2: phrases {red apple, green apple},
    // every word scores 2.0 (deg 4 / freq 2 or deg 8 / freq 4),
    // both phrases score 4.0, tie broken by phrase asc
    val docs = Seq((1L, "red apple and green apple"),
      (2L, "red apple and green apple")).toDF("doc_id", "text")
    val out = operators.TextAnalysis.rakeKeywords(docs).collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("phrase") === "green apple")
    assert(out(1).getAs[String]("phrase") === "red apple")
    out.foreach { r =>
      assert(r.getAs[Long]("cnt") === 2L)
      assert(math.abs(r.getAs[Double]("score") - 4.0) < 1e-9)
    }
  }

  test("rakeKeywords: single-word runs and all-stopword docs") {
    // 'apple the apple' -> two 1-token phrases of the same word
    // (score 1.0); an all-stopword doc contributes nothing
    val docs = Seq((1L, "apple the apple"), (2L, "the and of"))
      .toDF("doc_id", "text")
    val out = operators.TextAnalysis.rakeKeywords(docs).collect()
    assert(out.length === 1)
    assert(out(0).getAs[String]("phrase") === "apple")
    assert(out(0).getAs[Long]("cnt") === 2L)
    assert(math.abs(out(0).getAs[Double]("score") - 1.0) < 1e-9)
  }

  test("bayesAb: planted separation is near-certain, null effect is 0.5") {
    def ev(rows: Seq[(Long, String, Double)]) =
      rows.map { case (i, t, v) => (i, t, v, ts(1)) }
        .toDF("event_id", "event_type", "value", "s")
        .select(col("event_id"), col("event_type"), col("value"),
          to_timestamp(col("s")).as("ts"))
    val gap = ev((1L to 10L).map(i =>
      (i, "purchase", if (i % 2 == 0) 999.0 else 1001.0)) ++
      (11L to 20L).map(i => (i, "click", if (i % 2 == 0) 1.0 else 3.0)))
    // mean_b = 1000, mean_a = 2 -> lift 998
    val r1 = operators.Analytics.bayesAb(gap).collect()(0)
    assert(math.abs(r1.getAs[Double]("lift") - 998.0) < 1e-6)
    assert(r1.getAs[Double]("prob_b_beats_a") > 0.999999)
    assert(r1.getAs[Double]("ci_lo") < 998.0 && 998.0 < r1.getAs[Double]("ci_hi"))
    val same = ev((1L to 20L).map(i =>
      (i, if (i % 2 == 0) "purchase" else "click",
        if (i % 4 < 2) 10.0 else 20.0)))
    val r2 = operators.Analytics.bayesAb(same).collect()(0)
    assert(math.abs(r2.getAs[Double]("lift")) < 1e-9)
    // A&S |eps| < 7.5e-8: Phi(0) lands at 0.5 within tolerance
    assert(math.abs(r2.getAs[Double]("prob_b_beats_a") - 0.5) < 1e-5)
  }

  test("kneePoint: max chord distance lands on the planted bend") {
    val curve = Seq((0L, 0.0), (1L, 9.0), (2L, 9.5)).toDF("x", "y")
    val r = operators.Analytics.kneePoint(curve, "x", "y").collect()(0)
    assert(r.getAs[Long]("x") === 1L)
    // |0.5 − 9/9.5| = 0.447368
    assert(math.abs(r.getAs[Double]("gap") - 0.447368) < 1e-6)
  }

  test("obrienFleming: a planted separation crosses every OF boundary") {
    // 10 days, each with 2 purchases {999,1001} and 2 clicks {1,3}:
    // z ≈ 998/se at every look, far over even the 4.877 first boundary
    val rows = for {
      day <- 1 to 10
      (t, v) <- Seq(("purchase", 999.0), ("purchase", 1001.0),
        ("click", 1.0), ("click", 3.0))
    } yield (day.toLong * 10 + v.toLong, t, v, f"2024-01-$day%02d 12:00:00")
    val ev = rows.toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val out = operators.Analytics.obrienFleming(ev).collect()
    assert(out.length === 5)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("look") === (i + 1).toLong)
      assert(r.getAs[Long]("n_days") === 2L * (i + 1))
      assert(r.getAs[Long]("na") === 4L * (i + 1))
      assert(r.getAs[Long]("nb") === 4L * (i + 1))
      assert(r.getAs[Double]("z") > 100.0)
      assert(r.getAs[Boolean]("crossed"))
    }
    assert(out(0).getAs[Double]("boundary") === 4.8769)
    assert(out(4).getAs[Double]("boundary") === 2.0310)
  }

  test("obrienFleming: a null effect never crosses") {
    val rows = for {
      day <- 1 to 10
      (t, v) <- Seq(("purchase", 9.0), ("purchase", 11.0),
        ("click", 9.0), ("click", 11.0))
    } yield (day.toLong * 100 + v.toLong, t, v, f"2024-01-$day%02d 12:00:00")
    val ev = rows.toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val out = operators.Analytics.obrienFleming(ev).collect()
    assert(out.forall(r => r.getAs[Double]("z") === 0.0))
    assert(out.forall(r => !r.getAs[Boolean]("crossed")))
  }

  test("pinballLoss: hand-computed quantile forecasts and losses") {
    // train days 1..7 at $1..$7 hundred, test days 8..10 at $400:
    // type-1 ranks (k·7+9) div 10 = 1/4/7 -> forecasts $100/$400/$700;
    // pinball = .1·300 / 0 / .9·(−300 under) = 30 / 0 / 30
    val orders = (1 to 10).map { d =>
      (java.sql.Date.valueOf(f"2024-02-$d%02d"),
        if (d <= 7) d * 100.0 else 400.0)
    }.toDF("o_orderdate", "o_totalprice")
    val out = operators.Analytics.pinballLoss(orders).collect()
    assert(out.length === 3)
    val byQ = out.map(r => r.getAs[Double]("q") -> r).toMap
    assert(out.forall(_.getAs[Long]("n_train_days") === 7L))
    assert(out.forall(_.getAs[Long]("n_test_days") === 3L))
    assert(byQ(0.1).getAs[Double]("forecast") === 100.0)
    assert(byQ(0.5).getAs[Double]("forecast") === 400.0)
    assert(byQ(0.9).getAs[Double]("forecast") === 700.0)
    assert(math.abs(byQ(0.1).getAs[Double]("pinball_loss") - 30.0) < 1e-9)
    assert(byQ(0.5).getAs[Double]("pinball_loss") === 0.0)
    assert(math.abs(byQ(0.9).getAs[Double]("pinball_loss") - 30.0) < 1e-9)
    assert(byQ(0.1).getAs[Double]("exceed_rate") === 1.0)
    assert(byQ(0.9).getAs[Double]("exceed_rate") === 0.0)
  }

  test("nbFit: moments, NB parameters, and zero shares on planted days") {
    // daily purchase counts {2, 0, 4, 0}: m=1.5, v=11/3,
    // r = 2.25/(11/3−1.5) = 1.038462, p = 1.5/(11/3) = 0.409091
    val rows = Seq(
      ("2024-03-01", "purchase"), ("2024-03-01", "purchase"),
      ("2024-03-01", "click"),
      ("2024-03-02", "click"),
      ("2024-03-03", "purchase"), ("2024-03-03", "purchase"),
      ("2024-03-03", "purchase"), ("2024-03-03", "purchase"),
      ("2024-03-03", "click"),
      ("2024-03-04", "click"))
    val ev = rows.zipWithIndex.map { case ((d0, t), i) =>
      (i.toLong, t, 1.0, d0 + " 08:00:00")
    }.toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.nbFit(ev).collect()(0)
    assert(r.getAs[Long]("n_days") === 4L)
    assert(math.abs(r.getAs[Double]("mean") - 1.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("variance") - 11.0 / 3) < 1e-5)
    assert(math.abs(r.getAs[Double]("nb_r") - 1.038462) < 1e-6)
    assert(math.abs(r.getAs[Double]("nb_p") - 0.409091) < 1e-6)
    assert(r.getAs[Double]("zero_share_obs") === 0.5)
    assert(math.abs(r.getAs[Double]("zero_share_poisson") - 0.22313) < 1e-5)
  }

  test("maseNaive: linear trend scores exactly MASE 1 against itself") {
    // y_t = t dollars over 20 days: every weekly-naive error is $7, so
    // train and test MAE are both 7 and the ratio is exactly 1
    val orders = (1 to 20).map(t =>
      (java.sql.Date.valueOf(f"2024-03-$t%02d"), t * 1.0))
      .toDF("o_orderdate", "o_totalprice")
    val r = operators.Analytics.maseNaive(orders).collect()(0)
    assert(r.getAs[Long]("n_train_terms") === 7L) // t = 8..14
    assert(r.getAs[Long]("n_test_terms") === 6L)  // t = 15..20
    assert(r.getAs[Double]("mae_train") === 7.0)
    assert(r.getAs[Double]("mae_test") === 7.0)
    assert(r.getAs[Double]("mase") === 1.0)
  }

  test("maseNaive: a perfectly seasonal series yields null MASE, not Inf") {
    val orders = (1 to 20).map(t =>
      (java.sql.Date.valueOf(f"2024-03-$t%02d"), ((t - 1) % 7 + 1) * 10.0))
      .toDF("o_orderdate", "o_totalprice")
    val r = operators.Analytics.maseNaive(orders).collect()(0)
    assert(r.getAs[Double]("mae_train") === 0.0)
    assert(r.isNullAt(r.fieldIndex("mase")))
  }

  test("effDiameter: landmark reach invariants on the sf0.001 graph") {
    val out = operators.Graph.effDiameter(spark, sfDir).collect()
    assert(out.length === 3) // three landmark suppliers
    out.foreach { r =>
      assert(r.getAs[Long]("n_reached") > 0L)
      assert(r.getAs[Int]("eff_d90") <= r.getAs[Int]("max_dist"))
      assert(r.getAs[Int]("max_dist") <= 3)
    }
  }

  test("seasonalStrength: exact weekly pattern over a linear trend is 1/1") {
    // y_t = 7t + p(t mod 7): the centered 7-mean is exactly 7t+21, the
    // detrended series is the pure pattern, remainder 0 -> F_S = F_T = 1
    val p = Seq(0, 7, 14, 21, 28, 35, 42)
    val orders = (1 to 20).map { t =>
      (java.sql.Date.valueOf(f"2024-03-$t%02d"), (7 * t + p(t % 7)) * 1.0)
    }.toDF("o_orderdate", "o_totalprice")
    val r = operators.Analytics.seasonalStrength(orders).collect()(0)
    assert(r.getAs[Long]("n_days") === 14L) // days 4..17 have full windows
    assert(r.getAs[Double]("seasonal_strength") === 1.0)
    assert(r.getAs[Double]("trend_strength") === 1.0)
  }

  test("seasonalStrength: strengths stay in [0,1] on the sf0.001 fixture") {
    val r = operators.Analytics
      .seasonalStrength(Tables.orders(spark, sfDir)).collect()(0)
    val fs = r.getAs[Double]("seasonal_strength")
    val ft = r.getAs[Double]("trend_strength")
    assert(fs >= 0.0 && fs <= 1.0)
    assert(ft >= 0.0 && ft <= 1.0)
  }

  test("psiMatrix: flags exactly the planted drifted column") {
    // ref (H1) vs cur (H2): l_discount jumps to the top bin in H2,
    // the other three columns keep identical distributions
    val rows = (0 until 40).map { i =>
      val ref = i < 20
      val day = if (ref) f"2024-01-${i % 20 + 1}%02d"
      else f"2024-07-${i % 20 + 1}%02d"
      (java.sql.Date.valueOf(day),
        (i % 10) * 1.0,                     // l_quantity: same both halves
        100.0 + (i % 5),                    // l_extendedprice: same
        if (ref) (i % 10) * 0.01 else 0.09, // l_discount: drifts
        0.05)                               // l_tax: constant
    }.toDF("l_shipdate", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax")
    val out = operators.Evolution.psiMatrix(rows).collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[String]("feature")).toSeq ===
      Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax"))
    val byF = out.map(r => r.getAs[String]("feature") -> r).toMap
    assert(out.forall(r => r.getAs[Long]("n_ref") === 20L))
    assert(byF("l_discount").getAs[Boolean]("drifted"))
    assert(!byF("l_quantity").getAs[Boolean]("drifted"))
    assert(byF("l_quantity").getAs[Double]("psi") < 0.05)
    assert(!byF("l_tax").getAs[Boolean]("drifted"))
  }

  test("friedman: consistent within-day ordering gives the textbook max") {
    // 3 days, 5 types always ranked the same way: Rj = 3·(1..5),
    // Q = 12·495/(3·5·6) − 3·3·6 = 12, no ties -> adj = 12
    val rows = for {
      day <- 1 to 3
      (t, v) <- Seq("click" -> 10.0, "error" -> 20.0, "purchase" -> 30.0,
        "signup" -> 40.0, "view" -> 50.0)
    } yield (day.toLong * 10 + v.toLong, t, v, f"2024-04-$day%02d 09:00:00")
    val ev = rows.toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.friedman(ev).collect()(0)
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Long]("k_treatments") === 5L)
    assert(r.getAs[Double]("q_stat") === 12.0)
    assert(r.getAs[Double]("q_tie_adj") === 12.0)
  }

  test("tostEquivalence: equal arms pass, a wide gap fails") {
    def ev(rows: Seq[(Long, String, Double)]) =
      rows.map { case (i, t, v) => (i, t, v, ts(2)) }
        .toDF("event_id", "event_type", "value", "s")
        .select(col("event_id"), col("event_type"), col("value"),
          to_timestamp(col("s")).as("ts"))
    val same = ev((1L to 40L).map(i =>
      (i, if (i % 2 == 0) "purchase" else "click",
        if (i % 4 < 2) 10.0 else 11.0)))
    val r1 = operators.Analytics.tostEquivalence(same).collect()(0)
    assert(math.abs(r1.getAs[Double]("diff")) < 1e-9)
    assert(r1.getAs[Double]("delta") === 5.0)
    assert(r1.getAs[Boolean]("equivalent"))
    val far = ev((1L to 40L).map(i =>
      if (i <= 20) (i, "purchase", 100.0 + (i % 2))
      else (i, "click", 10.0 + (i % 2))))
    val r2 = operators.Analytics.tostEquivalence(far).collect()(0)
    assert(r2.getAs[Double]("diff") > 80.0)
    assert(!r2.getAs[Boolean]("equivalent"))
    assert(r2.getAs[Double]("p_upper") > 0.99)
  }

  test("goodTuring: hand-computed frequency-of-frequencies readout") {
    // tokens a a b c: N=4, V=3, N1=2, N2=1
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val r = operators.TextAnalysis.goodTuring(docs).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("vocab") === 3L)
    assert(r.getAs[Long]("n1") === 2L)
    assert(r.getAs[Long]("n2") === 1L)
    assert(r.getAs[Double]("p_unseen") === 0.5)
    assert(math.abs(r.getAs[Double]("hapax_share") - 2.0 / 3) < 1e-6)
    assert(r.getAs[Double]("r1_star") === 1.0)
  }

  test("captureRecapture: Chapman invariants on the planted corpus") {
    val docs = operators.Dedup.plantedCorpus(Tables.documents(spark, sfDir))
    val r = operators.Dedup.captureRecapture(docs).collect()(0)
    val n1 = r.getAs[Long]("n_det1"); val n2 = r.getAs[Long]("n_det2")
    val m = r.getAs[Long]("n_both")
    val est = r.getAs[Double]("est_total_pairs")
    // the planted exact-ish dups are caught by BOTH detectors
    assert(m > 0L && m <= math.min(n1, n2))
    // Chapman is at least as large as either sample (m <= n2 identity)
    assert(est >= math.max(n1, n2) - 1e-6)
    assert(r.getAs[Double]("coverage_det1") > 0.0 &&
      r.getAs[Double]("coverage_det1") <= 1.0 + 1e-6)
    assert(r.getAs[Double]("coverage_det2") > 0.0 &&
      r.getAs[Double]("coverage_det2") <= 1.0 + 1e-6)
  }

  test("macroF1: hand-built confusion over the langid heuristic") {
    // doc1 en predicted en ('the and'); doc2 en predicted und ('xyz');
    // doc3 de predicted de ('der und die'... 'und' is both de stopword
    // and the undetermined label — fine, it scores de); doc4 es
    // predicted de ('der die' text labeled es)
    val docs = Seq(
      (1L, "the and of", "en"), (2L, "xyz zzz", "en"),
      (3L, "der die und", "de"), (4L, "der die von", "es"))
      .toDF("doc_id", "text", "lang")
    val out = operators.TextAnalysis.macroF1(docs).collect()
    val byC = out.map(r => r.getAs[String]("cls") -> r).toMap
    // classes: de, en, es, und
    assert(out.map(_.getAs[String]("cls")).toSeq ===
      Seq("de", "en", "es", "und"))
    // en: n_true 2, tp 1, fp 0, fn 1 -> p 1, r .5, f1 = 2/3
    assert(byC("en").getAs[Long]("tp") === 1L)
    assert(byC("en").getAs[Double]("precision") === 1.0)
    assert(byC("en").getAs[Double]("recall") === 0.5)
    assert(math.abs(byC("en").getAs[Double]("f1") - 2.0 / 3) < 1e-6)
    // de: tp 1, fp 1 (es doc), fn 0 -> p .5, r 1, f1 = 2/3
    assert(byC("de").getAs[Long]("fp") === 1L)
    assert(math.abs(byC("de").getAs[Double]("f1") - 2.0 / 3) < 1e-6)
    // es: tp 0 -> f1 0; und: predicted only -> n_true 0, f1 0
    assert(byC("es").getAs[Double]("f1") === 0.0)
    assert(byC("und").getAs[Long]("n_true") === 0L)
    // macro = (2/3 + 2/3 + 0 + 0)/4 = 1/3; accuracy = 2/4
    assert(math.abs(byC("en").getAs[Double]("macro_f1") - 1.0 / 3) < 1e-5)
    assert(byC("en").getAs[Double]("accuracy") === 0.5)
  }

  test("wilcoxonSigned: all-positive diffs give the maximal statistic") {
    // 5 days, purchase always > click by a distinct margin:
    // W+ = n(n+1)/2 = 15, z = (15 - 7.5)/sqrt(13.75) = 2.022600
    val rows = (1 to 5).flatMap { d0 =>
      Seq((d0.toLong * 2, "purchase", (100 + d0 * 10).toDouble,
        f"2024-05-$d0%02d 10:00:00"),
        (d0.toLong * 2 + 1, "click", 50.0, f"2024-05-$d0%02d 11:00:00"))
    }
    val ev = rows.toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.wilcoxonSigned(ev).collect()(0)
    assert(r.getAs[Long]("n_pairs") === 5L)
    assert(r.getAs[Double]("w_plus") === 15.0)
    assert(math.abs(r.getAs[Double]("z") - 2.0226) < 1e-4)
    assert(r.getAs[Double]("p_value") < 0.05)
  }

  test("ljungBox: white noise scores low, a weekly cycle scores high") {
    // strong period-7 signal -> large Q
    val seasonal = (1 to 40).map(t =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(t.toLong)), ((t % 7) * 100 + 100).toDouble))
      .toDF("o_orderdate", "o_totalprice")
    val rs = operators.Analytics.ljungBox(seasonal).collect()(0)
    assert(rs.getAs[Long]("n_days") === 40L)
    assert(rs.getAs[Long]("dof") === 7L)
    // chi2(7) 99th percentile is 18.48; the cycle blows far past it
    assert(rs.getAs[Double]("q_stat") > 18.48)
  }

  test("repNgrams: exact ratios on a planted half-repeated corpus") {
    // 'a b a b' -> unigrams: 4 total, 2 distinct; bigrams: 3 total
    // ('a b','b a','a b'), 2 distinct; trigrams: 2 total 2 distinct;
    // 4-grams: 1/1
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = operators.TextAnalysis.repNgrams(docs).collect()
    assert(out.length === 4)
    val m = out.map(r => r.getAs[Long]("n_order") -> r).toMap
    assert(m(1L).getAs[Long]("total_ngrams") === 4L)
    assert(m(1L).getAs[Long]("distinct_ngrams") === 2L)
    assert(m(1L).getAs[Double]("distinct_ratio") === 0.5)
    assert(m(2L).getAs[Long]("total_ngrams") === 3L)
    assert(m(2L).getAs[Long]("distinct_ngrams") === 2L)
    assert(m(2L).getAs[Long]("top_count") === 2L)
    assert(m(4L).getAs[Double]("distinct_ratio") === 1.0)
  }

  test("abcClasses: integer 80/95 boundaries on a planted skew") {
    // parts with revenue 80, 15, 3, 2: cum shares 80/95/98/100 ->
    // A = {80}, B = {15}, C = {3, 2}
    val li = Seq((1L, 80.0), (2L, 15.0), (3L, 3.0), (4L, 2.0))
      .toDF("l_partkey", "l_extendedprice")
    val out = operators.Analytics.abcClasses(li).collect()
    val m = out.map(r => r.getAs[String]("abc") -> r).toMap
    assert(m("A").getAs[Long]("n_parts") === 1L)
    assert(m("A").getAs[Long]("share_ppm") === 800000L)
    assert(m("B").getAs[Long]("n_parts") === 1L)
    assert(m("C").getAs[Long]("n_parts") === 2L)
    assert(m("C").getAs[Long]("share_ppm") === 50000L)
  }

  test("markovStationary: a 2-cycle chain keeps the uniform vector") {
    // one session alternating purchase/click: P is the swap matrix, so
    // the uniform start is stationary -> 500000 ppm each
    val rows = (0 until 5).map { i =>
      (i.toLong, 1L, if (i % 2 == 0) "purchase" else "click", 1.0,
        f"2024-06-01 10:${i * 2}%02d:00")
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "value", "s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), to_timestamp(col("s")).as("ts"))
    val out = operators.Analytics.markovStationary(ev).collect()
    assert(out.map(_.getAs[String]("state")).toSeq ===
      Seq("click", "purchase"))
    out.foreach { r =>
      assert(r.getAs[Long]("share_ppm") === 500000L)
      assert(r.getAs[Long]("pi_mass") === 500000000000L)
    }
  }

  test("markovStationary: an absorbing state collects all the mass") {
    // purchase -> click -> click(self-loop via absorbing: click never
    // leaves because it's the session's last type each time)... plant:
    // two sessions 'purchase,click,click,click' so click->click
    // dominates and purchase only leaks out
    val rows = (0 until 4).map { i =>
      (i.toLong, 1L, if (i == 0) "purchase" else "click", 1.0,
        f"2024-06-02 10:${i * 2}%02d:00")
    }
    val ev = rows.toDF("event_id", "user_id", "event_type", "value", "s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), to_timestamp(col("s")).as("ts"))
    val out = operators.Analytics.markovStationary(ev).collect()
    val m = out.map(r => r.getAs[String]("state") -> r).toMap
    // purchase has no incoming mass after round 1; click absorbs ~all
    assert(m("click").getAs[Long]("share_ppm") >= 999999L)
    assert(m("purchase").getAs[Long]("pi_mass") === 0L)
  }

  test("priceIndex: hand-computed Laspeyres/Paasche/Fisher on two parts") {
    // part 1: p0=2, p1=3 (q0=10, q1=5); part 2: p0=4, p1=4 (q0=5, q1=10)
    // L = (3·10 + 4·5)/(2·10 + 4·5) = 50/40 = 1.25
    // P = (3·5 + 4·10)/(2·5 + 4·10) = 55/50 = 1.10
    // F = sqrt(1.375) = 1.172604
    def row(part: Long, day: String, qty: Double, ext: Double) =
      (part, java.sql.Date.valueOf(day), qty, ext)
    val li = Seq(
      row(1L, "2020-03-01", 10.0, 20.0), row(1L, "2023-05-01", 5.0, 15.0),
      row(2L, "2020-07-01", 5.0, 20.0), row(2L, "2023-09-01", 10.0, 40.0))
      .toDF("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
    val r = operators.Analytics.priceIndex(li).collect()(0)
    assert(r.getAs[Int]("base_year") === 2020)
    assert(r.getAs[Int]("current_year") === 2023)
    assert(r.getAs[Long]("n_parts") === 2L)
    assert(math.abs(r.getAs[Double]("laspeyres") - 1.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("paasche") - 1.1) < 1e-9)
    assert(math.abs(r.getAs[Double]("fisher") - 1.172604) < 1e-6)
  }

  test("embedMedian: the median ignores the outlier the mean cannot") {
    // dim0 values {0, 0, 0, 100}: type-1 median 0, mean 25
    val emb = Seq(
      (1L, Seq(0f, 1f), 0), (2L, Seq(0f, 2f), 0),
      (3L, Seq(0f, 3f), 0), (4L, Seq(100f, 4f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = operators.Similarity.embedMedian(emb).collect()
    val d0 = out.find(_.getAs[Long]("dim") === 0L).get
    assert(d0.getAs[Long]("n_vectors") === 4L)
    assert(d0.getAs[Double]("median_coord") === 0.0)
    assert(math.abs(d0.getAs[Double]("mean_coord") - 25.0) < 1e-6)
    // dim1 {1,2,3,4}: lower median 2, mean 2.5
    val d1 = out.find(_.getAs[Long]("dim") === 1L).get
    assert(d1.getAs[Double]("median_coord") === 2.0)
    assert(math.abs(d1.getAs[Double]("mean_coord") - 2.5) < 1e-6)
  }

  test("hhiSources: planted concentration hits the textbook values") {
    // token mass 50/25/25 across three sources:
    // HHI = .25 + .0625 + .0625 = .375, effective = 2.666667
    val docs = Seq(
      (1L, ("w " * 50).trim, "s1"), (2L, ("w " * 25).trim, "s2"),
      (3L, ("w " * 25).trim, "s3"))
      .toDF("doc_id", "text", "source")
    val r = operators.Curation.hhiSources(docs).collect()(0)
    assert(r.getAs[Long]("n_sources") === 3L)
    assert(math.abs(r.getAs[Double]("hhi") - 0.375) < 1e-9)
    assert(math.abs(r.getAs[Double]("effective_sources") - 8.0 / 3) < 1e-5)
  }

  test("ratioLiftCi: identical arms give zero lift and no significance") {
    // every user has the same (x, y) profile, so both arms' ratios are
    // identical whatever the hash split does
    val rows = (1L to 40L).flatMap { u =>
      Seq((u * 10, u, 12.0, ts(1)), (u * 10 + 1, u, 24.0, ts(2)))
    }
    val ev = rows.toDF("event_id", "user_id", "value", "s")
      .select(col("event_id"), col("user_id"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.ratioLiftCi(ev).collect()(0)
    assert(r.getAs[Long]("n_users_a") + r.getAs[Long]("n_users_b") === 40L)
    assert(math.abs(r.getAs[Double]("ratio_a") - 18.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ratio_b") - 18.0) < 1e-9)
    assert(r.getAs[Double]("diff") === 0.0)
    assert(!r.getAs[Boolean]("significant"))
    // per-user values are constant -> all variances 0 -> se 0
    assert(r.getAs[Double]("se") === 0.0)
  }

  test("modularity: Q invariants hold end-to-end on the sf0.001 graph") {
    // bounds, term-sum consistency, and the internal≤total degree
    // identity — the algebra a wrong join or double-counted edge breaks
    val out = operators.Graph.modularity(spark, sfDir).collect()
    assert(out.nonEmpty)
    val qTotal = out.head.getAs[Double]("q_total")
    // every row carries the same broadcast total, and Q is bounded
    assert(out.forall(r => r.getAs[Double]("q_total") === qTotal))
    assert(qTotal >= -0.5 && qTotal <= 1.0)
    // per-community terms sum (at 6dp) to the reported total
    val sumTerms = out.map(_.getAs[Double]("q_term")).sum
    assert(math.abs(sumTerms - qTotal) < 1e-6)
    // internal degree cannot exceed total degree
    assert(out.forall(r =>
      2 * r.getAs[Long]("internal_edges") <= r.getAs[Long]("deg_sum")))
  }
}
