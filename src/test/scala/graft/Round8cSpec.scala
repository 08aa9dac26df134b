package graft

import graft.operators.{Evolution, Multimodal, Training}
import org.apache.spark.sql.functions._

/** Round-8 continuation: FK orphans, column profile, DP sums, pack
  * boundaries, multimodal budget.
  */
class Round8cSpec extends SparkSpec {
  import spark.implicits._

  test("fk audit: planted orphans and null FKs are counted exactly") {
    val child = Seq((1L, Some(10L)), (2L, Some(11L)), (3L, None),
      (4L, Some(99L)), (5L, Some(99L))).toDF("id", "fk")
    val parent = Seq(10L, 11L, 12L).toDF("pk")
    val r = Evolution.fkAudit("t", child, "fk", parent, "pk").head()
    assert(r.getAs[Long]("n_child") == 5)
    assert(r.getAs[Long]("n_null_fk") == 1)
    assert(r.getAs[Long]("n_orphans") == 2) // both rows pointing at 99
    assert(r.getAs[Long]("orphan_ppm") == 400000)
  }

  test("fk sweep on the warehouse: synthetic star has zero orphans") {
    val rows = Evolution.queries("q_fk_orphans")(spark, sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0, r.toString)
      assert(r.getAs[Long]("n_child") > 0)
    }
  }

  test("column profile: NDV and null counts match per-column recomputation") {
    val rows = Evolution.queries("q_column_profile")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val o = Tables.orders(spark, sfDir)
    val n = o.count()
    Seq("o_orderkey", "o_orderstatus", "o_orderpriority").foreach { c =>
      val (pn, pnulls, pndv) = rows(c)
      assert(pn == n)
      assert(pnulls == o.filter(col(c).isNull).count())
      assert(pndv == o.select(c).distinct().filter(col(c).isNotNull).count())
    }
  }

  test("dp sums: clipping bounds every per-row contribution at C") {
    val r = Evolution.queries("q_dp_sums")(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    r.foreach { row =>
      val t = row.getString(0)
      val nRows = ev.filter(col("event_type") === t).count()
      val sc = row.getAs[Double]("sum_clipped")
      // clipped sum can never exceed n·C nor fall below 0
      assert(sc >= 0 && sc <= nRows * 100.0, s"$t: $sc vs ${nRows * 100.0}")
      // noise is bounded: |Laplace(C=100, eps=1)| < 100·37 nats
      assert(math.abs(row.getAs[Double]("sum_noisy") - sc) < 3700.0)
    }
    // clipping actually engages somewhere (values above $100 exist)
    val rawSum = ev.agg(sum((col("value")
      .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast("long"))).head().getLong(0) / 100.0
    assert(r.map(_.getAs[Double]("sum_clipped")).sum < rawSum)
  }

  test("pack boundaries: first doc starts at 0, offsets strictly increase below budget") {
    val rows = Training.queries("q_pack_boundaries")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bounds = r.getAs[String]("boundaries").split(";")
        .map(_.split("@")).map(a => (a(0).toLong, a(1).toLong))
      assert(bounds.length == r.getAs[Long]("n_docs"))
      // concat-and-chunk: only a shard's FIRST pack starts at offset 0 —
      // later packs open mid-spillover of the previous pack's last doc
      if (r.getAs[Long]("pack_id") % 1000000L == 0L)
        assert(bounds.head._2 == 0, "shard-initial pack must start at 0")
      assert(bounds.forall(_._2 < 512), "offsets live inside the budget")
      // doc ids ascend and so do start offsets within a pack
      assert(bounds.map(_._1).toSeq == bounds.map(_._1).sorted.toSeq)
      assert(bounds.map(_._2).toSeq == bounds.map(_._2).sorted.toSeq)
    }
  }

  test("median CI: brackets the exact median; matches hand rank recompute") {
    val r = graft.operators.Analytics.queries("q_median_ci")(spark, sfDir)
      .head()
    val (n, med, lo, hi) = (r.getAs[Long]("n"), r.getAs[Double]("median"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo <= med && med <= hi)
    val vals = Tables.orders(spark, sfDir)
      .select(col("o_totalprice").cast("double")).collect()
      .map(_.getDouble(0)).sorted
    assert(n == vals.length)
    val z = 1.959964
    val lR = math.max(math.floor((n - z * math.sqrt(n.toDouble)) / 2.0), 1).toLong
    val uR = math.min(math.ceil(1.0 + (n + z * math.sqrt(n.toDouble)) / 2.0)
      .toLong, n)
    assert(med == vals(((n + 1) / 2 - 1).toInt))
    assert(lo == vals((lR - 1).toInt) && hi == vals((uR - 1).toInt))
  }

  test("ratio CI: brackets the point estimate; ratio matches exact sums") {
    val r = graft.operators.Analytics.queries("q_ratio_ci")(spark, sfDir).head()
    val (ratio, lo, hi) = (r.getAs[Double]("ratio"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < ratio && ratio < hi)
    assert(r.getAs[Double]("se") > 0)
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val sx = ev.agg(sum((col("value")
      .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast("long"))).head().getLong(0)
    val sy = ev.count()
    assert(math.abs(ratio - sx.toDouble / sy / 100.0) < 1e-6)
  }

  test("srm: balanced md5 split does not trip; a rigged split does") {
    val r = graft.operators.Analytics.queries("q_srm_check")(spark, sfDir).head()
    assert(r.getAs[Long]("na") + r.getAs[Long]("nb") ==
      Tables.events(spark, sfDir).select("user_id").distinct().count())
    // the md5 assignment is fair by construction — chi2 should be small
    assert(!r.getAs[Boolean]("srm_detected"),
      s"fair split flagged: chi2=${r.getAs[Double]("chi2")}")
    // sanity of the statistic itself: a 60/40 split of 1000 must trip
    val e = 500.0
    val chi2Rigged = (600 - e) * (600 - e) / e + (400 - e) * (400 - e) / e
    assert(chi2Rigged > 3.841459)
  }

  test("qte: arm quantiles match per-arm grouped percentiles; qte = q_b - q_a") {
    val rows = graft.operators.Analytics.queries("q_qte")(spark, sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("p25", "p50", "p75"))
    rows.foreach { r =>
      val (qa, qb, qte) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(qte - BigDecimal(qb - qa).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("power curve: MDE shrinks as 1/sqrt(n); 4x sample halves the 1x MDE") {
    val rows = graft.operators.Analytics.queries("q_power_curve")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("mde_abs")).toMap
    // ordering: more samples → smaller detectable effect
    assert(rows("0.25x") > rows("0.5x") && rows("0.5x") > rows("1x") &&
      rows("1x") > rows("2x") && rows("2x") > rows("4x"))
    // the sqrt law: quadrupling n halves the MDE (integer-floor slack)
    assert(math.abs(rows("4x") - rows("1x") / 2.0) < rows("1x") * 0.01)
  }

  test("median CI width shrinks with n (order-statistic ranks tighten)") {
    import spark.implicits._
    def ci(n: Int): Double = {
      // derive from the operator's own arithmetic on a uniform ladder
      val z = 1.959964
      val lR = math.max(math.floor((n - z * math.sqrt(n.toDouble)) / 2.0), 1)
      val uR = math.min(math.ceil(1.0 + (n + z * math.sqrt(n.toDouble)) / 2.0), n)
      (uR - lR) / n.toDouble // relative rank width
    }
    assert(ci(10000) < ci(1000) && ci(1000) < ci(100))
  }

  test("quality sweep: monotone nonincreasing; threshold 0 keeps everything") {
    val rows = graft.operators.TextAnalysis.queries("q_quality_sweep")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val all = Tables.documents(spark, sfDir).count()
    assert(rows.head._1 == 0.0 && rows.head._2 == all)
    rows.sliding(2).foreach { case Array((_, d1, t1), (_, d2, t2)) =>
      assert(d2 <= d1 && t2 <= t1, "keeps must shrink as the cut rises")
    }
    assert(rows.last._2 < all, "the 1.0 cut must actually drop documents")
  }

  test("dedup sweep: pair counts shrink with the cut; 0.5 equals the detector") {
    val rows = graft.operators.Dedup.queries("q_dedup_sweep")(spark, sfDir)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val det = graft.operators.Dedup.queries("q_dedup_minhash")(spark, sfDir)
      .count()
    assert(rows.head == ((0.5, det)))
    rows.sliding(2).foreach { case Array((_, a), (_, b)) => assert(b <= a) }
    assert(rows.last._2 > 0, "exact planted copies keep the 0.9 cut non-empty")
  }

  test("curation funnel: every stage shrinks its planted victim class") {
    import graft.operators.Curation
    val good = "the quick brown fox jumps over the lazy dog again and again ok"
    val docs = Seq(
      (1L, "s1", good),                    // survives everything
      (2L, "s1", good + " extra words"),   // survives; s1's 2nd doc
      (3L, "s1", good + " more words yet"),// survives; capped at k=2
      (4L, "s1", "slow " + good),          // blocklisted
      (5L, "s2", "x y"),                   // fails quality (too short)
      (6L, "s2", good),                    // exact dup of 1? no — same text, min-id keeps 1
      (7L, "s2", good + " unique tail here")
    ).toDF("doc_id", "source", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val f = Curation.curationFunnel(docs, qualityCut = 0.4, capK = 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(f("raw") == 7)
    assert(f("blocklist") == 6)   // doc 4 dropped
    assert(f("quality") == 5)     // doc 5 dropped
    assert(f("exact_dedup") == 4) // doc 6 collapses into doc 1
    assert(f("source_cap") == 3)  // s1 capped to its 2 longest
  }

  test("mm budget: ledger is consistent with the patch plan and text tokens") {
    val b = Multimodal.queries("q_mm_budget")(spark, sfDir).collect()
    val plan = Multimodal.queries("q_mm_patch_plan")(spark, sfDir)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(b.map(_.getAs[Long]("vision_tokens")).sum == plan)
    b.foreach { r =>
      assert(r.getAs[Long]("total_tokens") ==
        r.getAs[Long]("text_tokens") + r.getAs[Long]("vision_tokens"))
      assert(r.getAs[Long]("n_over_context") <= r.getAs[Long]("n_docs"))
    }
  }
}
