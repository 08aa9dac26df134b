package graft

import org.apache.spark.sql.functions._

/** Round-11 hardening gates (the ADVICE_r10 items): sign-safe theilSen
  * floor division, gmmDaily zero-init-variance survival, hodgesLehmann
  * one-sample tie-correction 0/0, and saxMotifs week-gap adjacency.
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = {
    val c = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    c.set(2024, 0, 1, 0, 0, 0)
    c.set(java.util.Calendar.MILLISECOND, 0)
    c.add(java.util.Calendar.DAY_OF_MONTH, i)
    new java.sql.Timestamp(c.getTimeInMillis)
  }

  // ---- Theil–Sen sign-safe floor -----------------------------------------

  test("theilSen: negative non-divisible slope floors (not truncates)") {
    // two days 3 apart, second 1 cent LOWER: the only pairwise slope is
    // floor(-1 cent · 100 / 3 days) = floor(-33.33) = -34 fp units =
    // -$0.0034/day. Truncation toward zero would give -33 -> -0.0033.
    val rows = Seq((day(0), 10.00), (day(3), 9.99))
    val r = operators.Analytics.theilSen(
      rows.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(r.getAs[Long]("n_days") === 2L)
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(math.abs(r.getAs[Double]("slope_dollars_per_day") - -0.0034) < 1e-12)
  }

  test("theilSen: large daily deltas beyond the old 1e14 shift stay exact") {
    // Δ = $2e10/day exceeds the old K=1e14 shift's coverage (Δcents·100 =
    // 2e14 > K): the remainder-adjusted floor has no magnitude ceiling.
    val rows = Seq((day(0), 1.0e10), (day(1), 3.0e10))
    val r = operators.Analytics.theilSen(
      rows.toDF("o_orderdate", "o_totalprice")).collect()(0)
    assert(math.abs(r.getAs[Double]("slope_dollars_per_day") - 2.0e10) < 1.0)
  }

  // ---- GMM init-variance clamp -------------------------------------------

  test("gmmDaily: EXACTLY identical daily totals survive (s0 clamp)") {
    // all-identical corpus: init variance s0 = 0 -> before the clamp the
    // FIRST E-step hit exp(.../0)/sqrt(0) inside the eager ANSI condition
    val rows = (0 until 8).map(i => (day(i), 500.0))
    val r = operators.Analytics
      .gmmDaily(rows.toDF("o_orderdate", "o_totalprice")).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_days") === 8L)
    assert(math.abs(r(0).getAs[Double]("mu_lo_dollars") - 500.0) < 1e-6)
  }

  test("gmmDaily: single-day corpus survives") {
    val r = operators.Analytics
      .gmmDaily(Seq((day(0), 42.0)).toDF("o_orderdate", "o_totalprice"))
      .collect()
    assert(r.length === 1 && r(0).getAs[Long]("n_days") === 1L)
  }

  // ---- Hodges–Lehmann n<=1 tie denominator --------------------------------

  test("hodgesLehmann: one purchase day and zero click days do not abort") {
    // n = nx + ny = 1: tie/(n(n-1)) was 0/0 inside the eager when(v2 > 0)
    // condition; the guarded denominator keeps the plan alive (the empty
    // click side then legitimately releases zero rows via the hl join)
    val ev = Seq((day(0), "purchase", 25.0)).toDF("ts", "event_type", "value")
    val r = operators.Analytics.hodgesLehmann(ev).collect()
    assert(r.length <= 1) // no abort is the gate; rows are empty-side-defined
  }

  test("hodgesLehmann: one day each side still releases the exact shift") {
    val ev = Seq((day(0), "purchase", 30.0), (day(0), "click", 10.0))
      .toDF("ts", "event_type", "value")
    val r = operators.Analytics.hodgesLehmann(ev).collect()(0)
    assert(r.getAs[Long]("n_pairs") === 1L)
    assert(math.abs(r.getAs[Double]("hl_shift_dollars") - 20.0) < 1e-9)
    // n=2, no ties: v2 = 1/12·(3 − 0) = 0.25 -> z = (1 − 0.5)/0.5 = 1
    assert(math.abs(r.getAs[Double]("z") - 1.0) < 1e-9)
  }

  // ---- SAX motif week adjacency -------------------------------------------

  test("saxMotifs: an incomplete week breaks the motif chain") {
    // weeks 0..5 complete EXCEPT week 2 (6 days): complete weeks are
    // {0,1,3,4,5}, so the ONLY 3-consecutive run is (3,4,5) -> exactly one
    // motif row with n = 1. The old lead() stitched (0,1,3) and (1,3,4)
    // across the hole and released three.
    val rows = (0 until 42).filter(_ != 15) // drop one day of week 2
      .map(i => (day(i), 100.0 + i))
    val out = operators.Analytics
      .saxMotifs(rows.toDF("o_orderdate", "o_totalprice")).collect()
    assert(out.map(_.getAs[Long]("n")).sum === 1L)
  }

  test("saxMotifs: a contiguous calendar still yields all n-2 trigrams") {
    val rows = (0 until 42).map(i => (day(i), 100.0 + i)) // 6 full weeks
    val out = operators.Analytics
      .saxMotifs(rows.toDF("o_orderdate", "o_totalprice")).collect()
    assert(out.map(_.getAs[Long]("n")).sum === 4L) // 6 weeks -> 4 trigrams
  }

  // ---- quality LR classifier ----------------------------------------------

  test("qualityLr: hand-computed 2-feature GD trajectory and AUC") {
    // 4 curated docs (src0, y=1) of "alpha alpha alpha" and 4 crawl docs
    // (src1, y=0) of "beta beta beta": x_alpha = x_beta = 1.0 (signs are
    // both +1 for these tokens), buckets 7 and 11 are distinct, bias
    // gradient cancels. Hand-unrolled GD (eta=2, n=8):
    //   iter1: p=0.5, r=+-0.5          -> w = +-0.5
    //   iter2: r = round(1-sigma(0.5),9)        -> w = +-0.877541
    //   iter3: r = round(1-sigma(0.877541),9)   -> w = +-1.171229
    // Separable margins -> AUC = 1; loss = -ln(sigma(1.171229)) = 0.270016.
    import spark.implicits._
    val docs = ((0 until 4).map(i =>
        (i.toLong, "alpha alpha alpha", "en", "src0", 17L)) ++
      (4 until 8).map(i =>
        (i.toLong, "beta beta beta", "en", "src1", 14L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.Training.qualityLr(docs).collect()
    val byB = out.map(r => r.getAs[Long]("bucket") ->
      r.getAs[Double]("weight")).toMap
    assert(byB.keySet === Set(-1L, 7L, 11L))
    assert(math.abs(byB(7L) - 1.171229) < 1e-9)
    assert(math.abs(byB(11L) - -1.171229) < 1e-9)
    assert(math.abs(byB(-1L)) < 1e-9)
    val r0 = out(0)
    assert(r0.getAs[Long]("n_docs") === 8L)
    assert(r0.getAs[Long]("n_pos") === 4L)
    assert(math.abs(r0.getAs[Double]("auc") - 1.0) < 1e-9)
    assert(math.abs(r0.getAs[Double]("log_loss") - 0.270016) < 1e-9)
  }

  test("qualityLr: unseparable labels stay near AUC 0.5 without aborting") {
    import spark.implicits._
    // identical text on both sides: margins collapse to one value
    val docs = (0 until 6).map(i =>
        (i.toLong, "same same", "en", s"src$i", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.Training.qualityLr(docs).collect()
    assert(out.nonEmpty)
    val r0 = out(0)
    assert(r0.getAs[Long]("n_docs") === 6L)
    // all margins equal -> midrank AUC is exactly 0.5
    assert(math.abs(r0.getAs[Double]("auc") - 0.5) < 1e-9)
  }

  // ---- PPMI collocates -----------------------------------------------------

  test("ppmiTopK: hand-computed PPMI values, min-count, and ranking") {
    // corpus bigrams: (x,y) cb=3, (x,z) cb=1 (dropped: min-count 2),
    // (w,z) cb=2; N=6, cu: x=4 w=2, c2: y=3 z=3.
    // PPMI(w,z) = log2(2*6/(2*3)) = 1.0; PPMI(x,y) = log2(3*6/(4*3)) =
    // log2(1.5) = 0.584963.
    import spark.implicits._
    val docs = (
      (0 until 3).map(i => (i.toLong, "x y", "en", "src0", 3L)) ++
      Seq((3L, "x z", "en", "src0", 3L)) ++
      (4 until 6).map(i => (i.toLong, "w z", "en", "src1", 3L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.TextAnalysis.ppmiTopK(docs).collect()
    assert(out.length === 2)
    val byHead = out.map(r => r.getAs[String]("w1") -> r).toMap
    assert(byHead("w").getAs[String]("w2") === "z")
    assert(byHead("w").getAs[Long]("cb") === 2L)
    assert(math.abs(byHead("w").getAs[Double]("ppmi") - 1.0) < 1e-9)
    assert(byHead("x").getAs[String]("w2") === "y")
    assert(math.abs(byHead("x").getAs[Double]("ppmi") - 0.584963) < 1e-9)
    assert(out.forall(_.getAs[Int]("rank") === 1))
  }

  test("ppmiTopK: negative-PMI pairs are clipped out") {
    // every head pairs with everything equally -> all ratios r = 1 ->
    // no positive association survives the r > 1 clip
    import spark.implicits._
    val docs = Seq((0L, "p q", "en", "src0", 3L), (1L, "p q", "en", "src0", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // single bigram (p,q) cb=2: r = 2*2/(2*2) = 1 -> clipped
    assert(operators.TextAnalysis.ppmiTopK(docs).collect().isEmpty)
  }

  // ---- PCA subspace --------------------------------------------------------

  test("pcaSubspace: planted 2D structure recovered, orthonormal, shares") {
    import spark.implicits._
    // 40 vectors in 64-dim: dim0 = +-3 (variance 9), dim1 = +-1
    // (variance 1), patterns balanced so dims are uncorrelated. Expected:
    // pc1 = e0 (share 0.9), pc2 = e1 (share 0.1).
    val emb = (0 until 40).map { i =>
      val v = Array.fill(64)(0.0f)
      v(0) = if (i < 20) 3.0f else -3.0f
      v(1) = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = operators.Similarity.pcaSubspace(emb).collect()
    assert(rows.length === 128)
    val pc1 = rows.filter(_.getAs[Int]("pc") == 1)
      .sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    val pc2 = rows.filter(_.getAs[Int]("pc") == 2)
      .sortBy(_.getAs[Int]("dim")).map(_.getAs[Double]("loading"))
    assert(math.abs(math.abs(pc1(0)) - 1.0) < 1e-6)
    assert(pc1.drop(1).forall(x => math.abs(x) < 1e-6))
    assert(math.abs(math.abs(pc2(1)) - 1.0) < 1e-6)
    assert((pc2.take(1) ++ pc2.drop(2)).forall(x => math.abs(x) < 1e-6))
    // orthonormal: unit norms, zero dot
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(pc1, pc1) - 1.0) < 1e-6)
    assert(math.abs(dot(pc2, pc2) - 1.0) < 1e-6)
    assert(math.abs(dot(pc1, pc2)) < 1e-6)
    val s1 = rows.find(_.getAs[Int]("pc") == 1).get.getAs[Double]("var_share")
    val s2 = rows.find(_.getAs[Int]("pc") == 2).get.getAs[Double]("var_share")
    assert(math.abs(s1 - 0.9) < 1e-6)
    assert(math.abs(s2 - 0.1) < 1e-6)
    assert(s1 + s2 <= 1.0 + 1e-9)
  }

  // ---- unigram-LM EM round -------------------------------------------------

  test("unigramLm: hand-computed one-round EM posteriors and renorm") {
    // corpus: 3x "the cat", 1x "the dog". N=8; candidates (the,cat) cp=3,
    // (the,dog) cp=1. ppb probs: p(the)=5e8, p(cat)=3.75e8, p(dog)=1.25e8,
    // p(the cat)=3.75e8, p(the dog)=1.25e8. Both posteriors = 2/3
    // (666666666 ppb floored). Expected counts: the_cat 2.0 (3*2/3),
    // the 4-8/3=1.333333, cat 1.0, the_dog 0.666667, dog 0.333333;
    // N' = 8 - 8/3 = 5.333333; renormed p_ppb: the_cat 374999999,
    // the 250000000, cat 187500000, the_dog 124999999, dog 62500000.
    import spark.implicits._
    val docs = ((0 until 3).map(i => (i.toLong, "the cat", "en", "src0", 7L))
      :+ (3L, "the dog", "en", "src1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = operators.TextAnalysis.unigramLm(docs).collect()
    val got = rows.map(r => r.getAs[String]("piece") ->
      (r.getAs[Double]("expected_count"), r.getAs[Long]("p_ppb"))).toMap
    assert(rows.map(_.getAs[String]("piece")).toSeq ===
      Seq("the_cat", "the", "cat", "the_dog", "dog")) // p_ppb desc order
    assert(got("the_cat") === ((2.0, 374999999L)))
    assert(got("the") === ((1.333333, 250000000L)))
    assert(got("cat") === ((1.0, 187500000L)))
    assert(got("the_dog") === ((0.666667, 124999999L)))
    assert(got("dog") === ((0.333333, 62500000L)))
    // fertility cross-check (q_tokenizer_fertility's direction): one EM
    // round re-segments 8 raw tokens into an expected 5.333333 pieces --
    // merging strictly compresses, never inflates
    val totalPieces = rows.map(_.getAs[Double]("expected_count")).sum
    assert(math.abs(totalPieces - 5.333333) < 1e-3)
    assert(totalPieces < 8.0)
  }

  test("unigramLm: a pair-free corpus degenerates to the ML unigram model") {
    import spark.implicits._
    val docs = Seq((0L, "solo", "en", "src0", 4L), (1L, "solo", "en", "src0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = operators.TextAnalysis.unigramLm(docs).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("piece") === "solo")
    assert(rows(0).getAs[Long]("p_ppb") === 1000000000L)
    assert(rows(0).getAs[Double]("expected_count") === 2.0)
  }

  // ---- split leakage audit -------------------------------------------------

  test("splitLeakage: planted cross-split near-dups are counted exactly") {
    import spark.implicits._
    // 10 disjoint-vocabulary docs: the ONLY near-dup pairs are the 10
    // planted (i, i+1e7) copies. md5 split: ids 2,4,9 are held out while
    // their copies are not -> 3 cross pairs, leak_ppm = 300000.
    val docs = (0 until 10).map { i =>
      val words = (0 until 20).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, words, "en", "src0", 100L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.Dedup.splitLeakage(docs).collect()(0)
    assert(r.getAs[Long]("n_neardup_pairs") === 10L)
    assert(r.getAs[Long]("n_cross_pairs") === 3L)
    assert(r.getAs[Long]("leak_ppm") === 300000L)
    assert(r.getAs[Double]("max_cross_jaccard") >= 0.5)
  }

  // ---- embedding MMD drift ---------------------------------------------------

  test("embedMmd: hand-computed mean-shift and zero for identical groups") {
    import spark.implicits._
    def vec(hot: Int) = {
      val v = Array.fill(16)(0.0f); v(hot) = 1.0f; v.toSeq
    }
    // label 0: 4 copies of e0; label 1: 2 copies of e1; label 2: 3 copies
    // of e0 (identical mean to label 0)
    val emb = ((0 until 4).map(i => (i.toLong, vec(0), 0)) ++
      (4 until 6).map(i => (i.toLong, vec(1), 1)) ++
      (6 until 9).map(i => (i.toLong, vec(0), 2)))
      .toDF("vec_id", "embedding", "label")
    val rows = operators.Similarity.embedMmd(emb).collect()
    assert(rows.length === 3) // (0,1), (0,2), (1,2)
    val byPair = rows.map(r => (r.getAs[Int]("label_a"),
      r.getAs[Int]("label_b")) -> r.getAs[Double]("mmd2")).toMap
    // ||e0 - e1||^2 = 2.0
    assert(math.abs(byPair((0, 1)) - 2.0) < 1e-9)
    assert(math.abs(byPair((1, 2)) - 2.0) < 1e-9)
    assert(byPair((0, 2)) === 0.0)
    val r01 = rows.find(r => r.getAs[Int]("label_a") == 0 &&
      r.getAs[Int]("label_b") == 1).get
    assert(r01.getAs[Long]("n_a") === 4L && r01.getAs[Long]("n_b") === 2L)
  }

  // ---- cross-source containment ---------------------------------------------

  test("sourceOverlap: hand-computed containment matrix") {
    import spark.implicits._
    // s0: shingles {"a b c","b c d"}; s1: {"b c d","c d e"}; s2: {"x y z"}
    // -> s0<->s1 share exactly one shingle: containment 1/2 both ways;
    //    s2 shares nothing and is omitted.
    val docs = Seq(
      (0L, "a b c d", "en", "s0", 7L),
      (1L, "b c d e", "en", "s1", 7L),
      (2L, "x y z", "en", "s2", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = operators.Dedup.sourceOverlap(docs).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("nsh_a") === 2L)
      assert(r.getAs[Long]("n_shared") === 1L)
      assert(r.getAs[Long]("containment_ppm") === 500000L)
    }
    assert(rows.map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")))
      .toSet === Set(("s0", "s1"), ("s1", "s0")))
  }

  // ---- PCA projection --------------------------------------------------------

  test("pcaProject: planted structure projects onto the two components") {
    import spark.implicits._
    val emb = (0 until 40).map { i =>
      val v = Array.fill(64)(0.0f)
      v(0) = if (i < 20) 3.0f else -3.0f
      v(1) = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val rows = operators.Similarity.pcaProject(emb).collect()
    assert(rows.length === 20) // audit slice vec_id < 20
    rows.foreach { r =>
      // pc1 = e0: slice vectors all have x0 = +3
      assert(math.abs(math.abs(r.getAs[Double]("proj1")) - 3.0) < 1e-4)
      assert(math.abs(math.abs(r.getAs[Double]("proj2")) - 1.0) < 1e-4)
    }
    // proj2 alternates sign with the x1 pattern
    val p2 = rows.sortBy(_.getAs[Long]("vec_id")).map(_.getAs[Double]("proj2"))
    assert(p2.sliding(2).forall(w => w(0) * w(1) < 0))
  }

  // ---- PLSA topics -----------------------------------------------------------

  test("plsa: themed sources concentrate on their seeded topics") {
    import spark.implicits._
    // md5 seeds: dog/cat -> topic 0, red/blue -> topic 1, banana/star ->
    // topic 2. Each source speaks one theme; after two EM rounds each
    // source's mixture must argmax on its theme and each topic's top
    // word must come from its theme.
    val docs = Seq(
      (0L, "dog cat dog cat dog", "en", "s0", 20L),
      (1L, "cat dog cat dog", "en", "s0", 16L),
      (2L, "red blue red blue red", "en", "s1", 20L),
      (3L, "blue red blue", "en", "s1", 12L),
      (4L, "banana star banana star", "en", "s2", 22L),
      (5L, "star banana star", "en", "s2", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val mix = operators.TextAnalysis.plsaMix(docs).collect()
    assert(mix.length === 9) // 3 sources x 3 topics
    val best = mix.groupBy(_.getAs[String]("source")).map { case (src, rows) =>
      src -> rows.maxBy(_.getAs[Long]("mix_ppb")).getAs[Long]("topic")
    }
    assert(best === Map("s0" -> 0L, "s1" -> 1L, "s2" -> 2L))
    // mixtures normalize (ppb, floor loss < 10)
    mix.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val tot = rows.map(_.getAs[Long]("mix_ppb")).sum
      assert(tot > 999999990L && tot <= 1000000000L)
    }
    val topics = operators.TextAnalysis.plsaTopics(docs).collect()
    val topWord = topics.filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("topic") -> r.getAs[String]("word")).toMap
    assert(Set("dog", "cat").contains(topWord(0L)))
    assert(Set("red", "blue").contains(topWord(1L)))
    assert(Set("banana", "star").contains(topWord(2L)))
  }

  // ---- domain transfer matrix -------------------------------------------------

  test("domainPpl: same-language sources transfer, disjoint ones don't") {
    import spark.implicits._
    // s0 and s1 share a bigram language; s2 is vocabulary-disjoint.
    val docs = Seq(
      (0L, "a b a b a b a b", "en", "s0", 15L),
      (1L, "a b a b a b", "en", "s0", 11L),
      (2L, "a b a b", "en", "s1", 7L),
      (3L, "x y x y x y", "en", "s2", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = operators.TextAnalysis.domainPpl(docs).collect()
    assert(rows.length === 9) // 3 train x 3 eval
    def cell(t: String, e: String) =
      rows.find(r => r.getAs[String]("train_src") == t &&
        r.getAs[String]("eval_src") == e).get
    // disjoint vocab: zero coverage, no surprisal released
    assert(cell("s0", "s2").getAs[Long]("covered_ppm") === 0L)
    assert(cell("s0", "s2").isNullAt(
      cell("s0", "s2").fieldIndex("kn_bits")))
    assert(cell("s2", "s0").getAs[Long]("covered_ppm") === 0L)
    // shared language: full coverage both directions, finite bits
    assert(cell("s0", "s1").getAs[Long]("covered_ppm") === 1000000L)
    assert(cell("s1", "s0").getAs[Long]("covered_ppm") === 1000000L)
    assert(cell("s0", "s1").getAs[Double]("kn_bits") < 2.0)
    // diagonal scores exist and are finite
    Seq("s0", "s1", "s2").foreach { t =>
      assert(cell(t, t).getAs[Long]("covered_ppm") === 1000000L)
      assert(cell(t, t).getAs[Double]("kn_bits") >= 0.0)
    }
  }

  // ---- quality LR holdout ----------------------------------------------------

  test("qualityLr holdout: fit on train split, exact held-out AUC") {
    // same 8-doc corpus as the base spec; md5 holds out ids {2, 4} (one
    // alpha/y=1 doc, one beta/y=0 doc), leaving 3v3 training docs -> by
    // symmetry the SAME GD trajectory (+-0.5 -> +-0.877541 -> +-1.171229),
    // then AUC/log-loss score the two held docs only: separable margins
    // give AUC 1 and the same per-doc loss 0.270016.
    import spark.implicits._
    val docs = ((0 until 4).map(i =>
        (i.toLong, "alpha alpha alpha", "en", "src0", 17L)) ++
      (4 until 8).map(i =>
        (i.toLong, "beta beta beta", "en", "src1", 14L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.Training.qualityLr(docs, holdout = true).collect()
    val byB = out.map(r => r.getAs[Long]("bucket") ->
      r.getAs[Double]("weight")).toMap
    assert(math.abs(byB(7L) - 1.171229) < 1e-9)
    assert(math.abs(byB(11L) - -1.171229) < 1e-9)
    val r0 = out(0)
    assert(r0.getAs[Long]("n_docs") === 2L)  // held-out docs only
    assert(r0.getAs[Long]("n_pos") === 1L)
    assert(math.abs(r0.getAs[Double]("auc") - 1.0) < 1e-9)
    assert(math.abs(r0.getAs[Double]("log_loss") - 0.270016) < 1e-9)
  }
}
