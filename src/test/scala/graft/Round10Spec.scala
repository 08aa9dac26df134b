package graft

import org.apache.spark.sql.functions._

/** Hand-computed gates for the round-10 operators: Kneser-Ney LM,
  * IPS/SNIPS off-policy evaluation, Brier decomposition, two-regressor
  * OLS, and DoReMi-shape domain reweighting.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // ---- Kneser-Ney ------------------------------------------------------

  test("knLmTopK: hand-computed discount and interpolated probability") {
    // corpus bigrams: (a b) x2, (b a) x1, (a c) x1  ->  types: 3
    // n1 = 2 (b a, a c), n2 = 1 (a b) -> D = 2/(2+2) = 0.5
    val docs = Seq((1L, "a b a b", "s1"), (2L, "a c", "s1"))
      .toDF("doc_id", "text", "source")
    // doc1 bigrams: (a,b),(b,a),(a,b); doc2: (a,c)
    val top = operators.TextAnalysis.knLmTopK(docs, k = 10).collect()
    val ab = top.find(r => r.getString(1) == "b" && r.getString(0) == "a").get
    assert(ab.getAs[Long]("cb") === 2L)
    assert(ab.getAs[Long]("cu") === 3L) // c(a,.) = ab,ab,ac
    assert(ab.getAs[Long]("fwd") === 2L) // a -> {b, c}
    assert(ab.getAs[Long]("bwd") === 1L) // b completed only by a
    assert(ab.getAs[Double]("discount") === 0.5)
    // P(b|a) = (2-0.5)/3 + 0.5*2/3 * (1/3) = 0.5 + 0.111111 = 0.611111
    assert(math.abs(ab.getAs[Double]("p_kn") - 0.611111) < 1e-6)
  }

  test("knSurprisal: repeated-text source scores fewer bits than a rare one") {
    val rep = (1L to 6L).map(i => (i, "the cat sat on the mat", "common"))
    val rare = Seq((7L, "zyx quux fnord blarg", "rare"))
    val docs = (rep ++ rare).toDF("doc_id", "text", "source")
    val m = operators.TextAnalysis.knSurprisal(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("kn_bits")).toMap
    assert(m("common") < m("rare"))
    assert(m.values.forall(_ > 0.0))
  }

  // ---- IPS / SNIPS -----------------------------------------------------

  test("ipsOffPolicy: per-action fold reproduces the row-level estimator") {
    // 4 events at hour 10 (target = click): two clicks ($10, $20),
    // one view ($5), one purchase ($40). p(click)=2/4, others 1/4.
    // w_i = 1/p(a_i) on matched rows: the two clicks, w = 2.
    // V_IPS = (2*10 + 2*20)/4 = 15 ; V_SNIPS = 60/4 / (4/4) = 15
    // ESS = (Sw)^2/Sw^2 = 16/8 = 2
    val ev = Seq(
      (1L, 1L, "click", 10.0, "2024-07-01 10:00:00"),
      (2L, 1L, "click", 20.0, "2024-07-01 10:10:00"),
      (3L, 2L, "view", 5.0, "2024-07-01 10:20:00"),
      (4L, 2L, "purchase", 40.0, "2024-07-01 10:30:00"))
      .toDF("event_id", "user_id", "event_type", "value", "s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.ipsOffPolicy(ev).collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_matched") === 2L)
    assert(math.abs(r.getAs[Double]("ips_value") - 15.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("snips_value") - 15.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("ess") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("match_rate") - 0.5) < 1e-6)
  }

  test("ipsOffPolicy: zero matches yields null SNIPS, never a divide") {
    val ev = Seq((1L, 1L, "error", 3.0, "2024-07-01 02:00:00"))
      .toDF("event_id", "user_id", "event_type", "value", "s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.ipsOffPolicy(ev).collect()(0)
    assert(r.getAs[Long]("n_matched") === 0L)
    assert(r.isNullAt(r.fieldIndex("snips_value")))
    assert(math.abs(r.getAs[Double]("ips_value")) < 1e-9)
  }

  // ---- Brier decomposition --------------------------------------------

  test("brierDecomposition: textbook two-bin case") {
    // bin .2: forecasts 0.20 x4, outcomes 1,0,0,0 (rate .25)
    // bin .8: forecasts 0.80 x4, outcomes 1,1,1,0 (rate .75)
    // BS = (4*((.2)^2*3 + (.8)^2) + 4-block) /8
    //  row terms: (.2-0)^2 x3 =.04x3, (.2-1)^2=.64 ; (.8-1)^2 x3=.04x3,
    //  (.8-0)^2=.64 -> total 2*(.12+.64)=1.52 -> BS=.19
    // REL = (4*(.2-.25)^2 + 4*(.8-.75)^2)/8 = (4*.0025*2)/8 = .0025
    // obar=.5 -> RES = (4*(.25-.5)^2+4*(.75-.5)^2)/8 = .0625
    // UNC = .25 ; identity: .0025-.0625+.25 = .19 = BS, gap 0
    val df = Seq(
      (0.20, 1), (0.20, 0), (0.20, 0), (0.20, 0),
      (0.80, 1), (0.80, 1), (0.80, 1), (0.80, 0))
      .toDF("q", "label")
    val r = operators.TextAnalysis.brierDecomposition(df, "q", "label")
      .collect()(0)
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[Long]("n_bins") === 2L)
    assert(math.abs(r.getAs[Double]("brier") - 0.19) < 1e-9)
    assert(math.abs(r.getAs[Double]("reliability") - 0.0025) < 1e-9)
    assert(math.abs(r.getAs[Double]("resolution") - 0.0625) < 1e-9)
    assert(math.abs(r.getAs[Double]("uncertainty") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("decomp_gap")) < 1e-9)
  }

  // ---- OLS via normal equations ---------------------------------------

  test("olsMulti: exact planted plane is recovered with r2 = 1") {
    // price = 3 + 2*qty + 50*discount  (USD), quantities/discounts varied
    val rows = for {
      q <- 1 to 6; dpc <- Seq(0.00, 0.05, 0.10)
    } yield (q.toLong, dpc, 3.0 + 2.0 * q + 50.0 * dpc)
    val li = rows.toDF("l_quantity", "l_discount", "l_extendedprice")
    val r = operators.Analytics.olsMulti(li).collect()(0)
    assert(math.abs(r.getAs[Double]("intercept_usd") - 3.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("per_qty_usd") - 2.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("per_discount_usd") - 50.0) < 1e-3)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("olsMulti: collinear design yields null coefficients, no divide") {
    // discount is an exact linear function of quantity -> singular X'X
    val rows = (1 to 8).map(q => (q.toLong, q * 0.01, 10.0 + q))
    val li = rows.toDF("l_quantity", "l_discount", "l_extendedprice")
    val r = operators.Analytics.olsMulti(li).collect()(0)
    assert(r.isNullAt(r.fieldIndex("per_qty_usd")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  // ---- TextRank ----------------------------------------------------------

  test("textRank: the hub word outranks its spokes") {
    val docs = Seq(
      (1L, "spark runs fast", "s"), (2L, "spark scales well", "s"),
      (3L, "spark joins data", "s"), (4L, "spark streams data", "s"))
      .toDF("doc_id", "text", "source")
    val rows = operators.TextAnalysis.textRank(docs, iters = 6, k = 20)
      .collect()
    assert(rows.head.getString(0) === "spark")
    assert(rows.head.getAs[Long]("rank_ppm") >
      rows.last.getAs[Long]("rank_ppm"))
    // fixed-point masses stay in ppm range
    assert(rows.forall(r => r.getAs[Long]("rank_ppm") > 0 &&
      r.getAs[Long]("rank_ppm") < 1000000L))
  }

  // ---- Platt scaling ------------------------------------------------------

  test("plattScaling: uninformative labels fix A=B=0 at log-loss ln2") {
    // every level converts at exactly 1/2 -> gradient is 0 at the
    // (0,0) start, Newton stays put, loss is the coin-flip entropy
    val df = Seq(0.1, 0.3, 0.5, 0.7, 0.9)
      .flatMap(s => Seq((s, 1), (s, 0)))
      .toDF("q", "label")
    val r = operators.TextAnalysis.plattScaling(df, "q", "label")
      .collect()(0)
    assert(r.getAs[Double]("platt_a") === 0.0)
    assert(r.getAs[Double]("platt_b") === 0.0)
    assert(math.abs(r.getAs[Double]("log_loss") - math.log(2.0)) < 1e-5)
  }

  test("plattScaling: a monotone rate curve fits a positive slope") {
    // rate rises with the score -> A > 0 and the fit beats coin-flip
    val rows = Seq((0.1, 10, 1), (0.3, 10, 3), (0.5, 10, 5),
      (0.7, 10, 7), (0.9, 10, 9)).flatMap { case (s, w, pos) =>
      (1 to pos).map(_ => (s, 1)) ++ (1 to (w - pos)).map(_ => (s, 0))
    }
    val df = rows.toDF("q", "label")
    val r = operators.TextAnalysis.plattScaling(df, "q", "label")
      .collect()(0)
    assert(r.getAs[Long]("n") === 50L)
    assert(r.getAs[Double]("platt_a") > 0.0)
    assert(r.getAs[Double]("log_loss") < math.log(2.0))
  }

  // ---- RMST -------------------------------------------------------------

  test("rmst: hand-computed KM step integral with censored tail") {
    // user1: days 1..4 (dur 3, not censored; last-seen != corpus max)
    // user2: day 1 and day 10 (dur 9, censored at corpus max)
    // user3: day 10 only (dur 0, censored)
    // KM: at dur 3, n_at_risk 2, d 1 -> S = 0.5 (dur-0/9 rows have d=0)
    // RMST(14) = 1.0*(3-0) + 0.5*(14-3) = 8.5
    val ev = Seq(
      (1L, 1L, "2024-07-01 10:00:00"), (2L, 1L, "2024-07-04 10:00:00"),
      (3L, 2L, "2024-07-01 10:00:00"), (4L, 2L, "2024-07-10 10:00:00"),
      (5L, 3L, "2024-07-10 12:00:00"))
      .toDF("event_id", "user_id", "s")
      .select(col("event_id"), col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.rmst(ev).collect()(0)
    assert(r.getAs[Int]("tau") === 14)
    assert(math.abs(r.getAs[Double]("rmst_days") - 8.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("rmst_share") - 8.5 / 14.0) < 1e-6)
  }

  // ---- ALS half-step ----------------------------------------------------

  test("alsStep: one half-step beats the predict-zero baseline") {
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val rows = operators.Training.alsStep(orders, li).collect()
    assert(rows.length === 10)
    val rmse = rows.head.getAs[Double]("rmse")
    val rms0 = rows.head.getAs[Double]("rms_zero")
    assert(rmse > 0.0 && rmse < rms0)
    // factors solved, not defaulted
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("p1"))))
    // ranked by factor norm descending
    val norms = rows.map(r => math.pow(r.getAs[Double]("p1"), 2) +
      math.pow(r.getAs[Double]("p2"), 2))
    assert(norms.zip(norms.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  // ---- Markov removal attribution ----------------------------------------

  test("markovAttribution: converting channel carries the full effect") {
    // two sessions click->purchase, one session view (never converts):
    // P_full = 2/3; removing click kills all conversions (effect 1e6 ppm),
    // removing view changes nothing (effect 0)
    val ev = Seq(
      (1L, 1L, "click", "2024-07-01 10:00:00"),
      (2L, 1L, "purchase", "2024-07-01 10:01:00"),
      (3L, 2L, "click", "2024-07-01 11:00:00"),
      (4L, 2L, "purchase", "2024-07-01 11:01:00"),
      (5L, 3L, "view", "2024-07-01 12:00:00"))
      .toDF("event_id", "user_id", "event_type", "s")
      .select(col("event_id"), col("user_id"), col("event_type"),
        lit(1.0).as("value"), to_timestamp(col("s")).as("ts"))
    val rows = operators.Analytics.markovAttribution(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("click", "view"))
    assert(rows("click").getAs[Long]("p_full_ppm") === 666666L)
    assert(rows("click").getAs[Long]("p_removed_ppm") === 0L)
    assert(rows("click").getAs[Long]("removal_effect_ppm") === 1000000L)
    assert(rows("view").getAs[Long]("removal_effect_ppm") === 0L)
  }

  // ---- CCNet buckets ------------------------------------------------------

  test("ccnetBuckets: repeated-text source heads, gibberish source tails") {
    val easy = (1L to 3L).map(i => (i, "the cat sat on the mat again", "easy"))
    val hard = Seq((4L, "zyx quux fnord blarg xylo", "hard"),
      (5L, "vex jolt wizzle kern plonk", "hard"),
      (6L, "grok snarf blip quux zeta", "hard"))
    val mid = (7L to 9L).map(i =>
      (i, s"the cat quux number$i on mat", "mid"))
    val docs = (easy ++ hard ++ mid).toDF("doc_id", "text", "source")
    val rows = operators.Curation.ccnetBuckets(docs).collect()
    val m = rows.map(r => (r.getString(0), r.getString(1)) ->
      r.getAs[Long]("n_docs")).toMap
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 9L)
    // identical easy docs share one surprisal level -> all head
    assert(m.getOrElse(("easy", "head"), 0L) === 3L)
    assert(m.getOrElse(("hard", "tail"), 0L) >= 2L)
    // per-source shares are ppm of that source's docs
    assert(rows.filter(_.getString(0) == "easy")
      .map(_.getAs[Long]("share_ppm")).sum === 1000000L)
  }

  // ---- k-center coreset ---------------------------------------------------

  test("kCenterCoreset: farthest-first picks one center per planted cluster") {
    // three directionally-distinct clusters (codes are scale-invariant)
    def v(dir: Int, eps: Float) = {
      val a = Array.fill(4)(0f); a(dir) = 1f; a((dir + 1) % 4) = eps; a
    }
    val emb = Seq(
      (1L, v(0, 0.00f)), (2L, v(0, 0.02f)), (3L, v(0, 0.04f)),
      (10L, v(1, 0.00f)), (11L, v(1, 0.02f)),
      (20L, v(2, 0.00f)), (21L, v(2, 0.02f)))
      .toDF("vec_id", "embedding")
    val rows = operators.Training.kCenterCoreset(emb, k = 3).collect()
    assert(rows.length === 3)
    val ids = rows.map(_.getAs[Long]("center_id"))
    assert(ids(0) === 1L) // deterministic seed: min vec_id
    // one center per cluster: ids span the three id bands
    assert(ids.map(_ / 10).toSet === Set(0L, 1L, 2L))
    // greedy invariant: selection distance is non-increasing
    val dsel = rows.drop(1).map(_.getAs[Long]("d2_selected"))
    assert(dsel.zip(dsel.tail).forall { case (a, b) => a >= b })
    // covering radius is within-cluster scale, far below cross-cluster
    assert(rows.head.getAs[Long]("radius_d2") < dsel.min)
  }

  // ---- adversarial validation ---------------------------------------------

  test("adversarial validation: a split-independent feature scores near 0.5") {
    val docs = Tables.documents(spark, sfDir)
    val r = operators.Analytics.aucDelongCi(docs, col("n_chars"),
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 5 === 0).collect()(0)
    val auc = r.getAs[Double]("auc")
    assert(auc > 0.35 && auc < 0.65)
    // the CI straddles chance — the healthy-split verdict
    assert(r.getAs[Double]("ci_lo") < 0.5 && r.getAs[Double]("ci_hi") > 0.5)
  }

  // ---- Domain reweighting ---------------------------------------------

  test("domainReweight: weights normalize and the hard source upweights") {
    val rep = (1L to 6L).map(i => (i, "the cat sat on the mat", "common"))
    val rare = Seq((7L, "zyx quux fnord blarg", "rare"),
      (8L, "vex jolt wizzle kern", "rare"))
    val docs = (rep ++ rare).toDF("doc_id", "text", "source")
    val rows = operators.Curation.domainReweight(docs).collect()
    val w = rows.map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    val a = rows.map(r => r.getString(0) -> r.getAs[Double]("alpha")).toMap
    assert(math.abs(w.values.sum - 1.0) < 1e-5)
    assert(math.abs(a.values.sum - 1.0) < 1e-5)
    // the source the corpus LM finds hard gets more mass
    assert(w("rare") > w("common"))
    // smoothing keeps every source sampled
    assert(a.values.forall(_ > 0.05))
  }
}
