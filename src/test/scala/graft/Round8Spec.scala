package graft

import graft.operators.{Graph, Similarity, Training}
import org.apache.spark.sql.functions._

/** Round-8 additions: fixed-point PageRank, MMR diversity rerank,
  * per-epoch deterministic shuffle/shard plan.
  */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  test("pagerank: hand replay on a 3-node path graph, mass conserved-ish") {
    // path a—b—c (symmetrized): deg(a)=deg(c)=1, deg(b)=2
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val got = Graph.pagerankOnEdges(edges, iters = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // exact integer replay of the operator's arithmetic
    val scale = 1000000000000L
    val base = scale / 3
    val tele = 15L * base / 100L
    var p = Map("a" -> base, "b" -> base, "c" -> base)
    val deg = Map("a" -> 1L, "b" -> 2L, "c" -> 1L)
    for (_ <- 1 to 3) {
      val contrib = Map(
        "a" -> p("b") / deg("b"),          // from b
        "b" -> (p("a") / deg("a") + p("c") / deg("c")),
        "c" -> p("b") / deg("b"))
      p = contrib.map { case (n, s) => n -> (tele + 85L * s / 100L) }
    }
    val want = p.toSeq.sortBy { case (n, m) => (-m, n) }
    assert(got.toSeq == want)
    // the hub b outranks the leaves; total mass stays near SCALE
    assert(got.head._1 == "b")
    val total = got.map(_._2).sum
    assert(total > (scale * 9) / 10 && total <= scale)
  }

  test("pagerank on the interaction graph: suppliers dominate (higher degree)") {
    val rows = Graph.queries("q_pagerank_entity")(spark, sfDir).collect()
    assert(rows.length == 10)
    // suppliers connect to many customers; the hub side of the bipartite
    // graph must hold the top mass
    assert(rows.head.getString(0).startsWith("s:"))
    // strictly ordered output
    val masses = rows.map(_.getLong(1)).toSeq
    assert(masses == masses.sorted(Ordering[Long].reverse))
  }

  test("mmr: near-duplicate of the top hit is demoted below a diverse hit") {
    def vec(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(64 - xs.length)(0.0)).map(_.toFloat).toArray
    // rel order is 5 (2.4), 6 (2.2), 7 (0.0); but 6 is a scaled copy of 5
    // (sim 2.64 > its own rel) while 7 is orthogonal to 5 — MMR demotes 6
    val emb = Seq(
      (0L, vec(1.0, 1.0)),          // query
      (5L, vec(1.2, 1.2)),          // best rel
      (6L, vec(1.1, 1.1)),          // same direction as 5 — redundant
      (7L, vec(1.0, -1.0))          // orthogonal to 5, rel 0
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb, nQ = 1, shortlist = 3, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 5L), (2, 7L), (3, 6L)),
      s"got ${got.toSeq}: pure-rel order would be 5, 6, 7")
  }

  test("mmr: ranks are 1..k per query; scores nonincreasing from rank 2") {
    val rows = Similarity.queries("q_mmr_rerank")(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length).toSeq)
      // from rank 2 on the selected set only grows, so the max-sim
      // penalty only grows and greedy scores can't increase (rank 1 is
      // excluded: its penalty is DEFINED 0, and a negative max-sim at
      // rank 2 can legitimately score above a rank-1 rel)
      val sc = rs.sortBy(_.getInt(1)).map(_.getLong(3)).drop(1)
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
  }

  test("late interaction: MaxSim sums per-query-vector maxes, token match wins") {
    def vec(xs: Double*): Array[Float] =
      (xs ++ Seq.fill(64 - xs.length)(0.0)).map(_.toFloat).toArray
    val Q = 1048576L * 1048576L // one unit·unit dot in 2^20 fixed point
    val emb = Seq(
      (0L, vec(1.0, 0.0)), (1L, vec(0.0, 1.0)),   // query doc 0 (2 vecs)
      (4L, vec(2.0, 0.0)), (5L, vec(0.0, 0.0)),   // doc 2: only q0 matches
      (6L, vec(1.0, 0.0)), (7L, vec(0.0, 1.5))    // doc 3: both match
    ).toDF("vec_id", "embedding")
    val got = Similarity.lateInteractionTopK(emb, nQ = 1, groupSize = 2, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    // doc 3: 1·1 + 1·1.5 = 2.5 units beats doc 2's best-token 2·1 = 2 —
    // per-token matching that a mean-pooled single vector would blur
    assert(got.toSeq == Seq((3L, Q * 5 / 2, 1), (2L, Q * 2, 2)), got.toSeq)
  }

  test("containment tier: all planted quotes found at 1.0 with sub-threshold jaccard") {
    val rows = graft.operators.Dedup.queries("q_dedup_containment")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // every planted quote i (and its co-quote i+20) is contained in host
    // i+30000000 at exactly 1.0 — its shingle set sits verbatim inside
    (0L until 10L).foreach { i =>
      val hit = rows.find(t => t._1 == i && t._2 == i + 30000000L)
      assert(hit.isDefined, s"planted quote $i -> host missing")
      assert(hit.get._3 == 1.0)
      // the class is invisible to symmetric tiers: jaccard below the
      // 0.7 ngram threshold for at least the typical planted pair
    }
    val plantedJac = (0L until 10L).flatMap(i =>
      rows.find(t => t._1 == i && t._2 == i + 30000000L)).map(_._4)
    assert(plantedJac.count(_ < 0.7) >= 8,
      s"planted jaccards unexpectedly high: $plantedJac")
    // directionality: hosts are never 'contained' in their quotes
    assert(!rows.exists(t => t._1 >= 30000000L && t._2 < 30000000L &&
      t._1 - 30000000L == t._2))
  }

  test("tier report: each planted dup class lands in exactly its tier's marginal") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (0L, base),                                      // base
      (1L, base),                                      // exact copy
      (2L, base.toUpperCase + "!!"),                   // normalized copy
      (3L, base.dropRight(2) + "nu"),                  // near-dup (1 token)
      (4L, base + " " + (1 to 20).map(i => s"w$i").mkString(" ")), // host
      (5L, "completely different content here nothing shared at all ok")
    ).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.dedupTierReport(docs).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows("exact") == ((1L, 1L)))            // (0,1)
    assert(rows("normalized") == ((3L, 2L)))       // {0,1,2} pairs, 2 new
    assert(rows("minhash_jaccard") == ((3L, 2L)))  // (0,1),(0,3),(1,3); new: x,3
    // directed: 0↔1, 0↔3, 1↔3 plus the host pairs 0→4, 1→4, and 3→4
    // (the near-dup shares 9 of its 10 shingles with the host too) = 9;
    // marginal = the three host pairs, the class no earlier tier sees
    assert(rows("containment") == ((9L, 3L)), rows.toString)
  }

  test("psi drift: sides partition the non-null values; PSI is a nonneg J-divergence") {
    val r = graft.operators.Evolution.queries("q_psi_drift")(spark, sfDir).head()
    val nonNull = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull).count()
    assert(r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur") == nonNull)
    assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    // PSI = KL(p||q) + KL(q||p) ≥ 0, and identical populations give ~0
    assert(r.getAs[Double]("psi") >= 0.0)
    assert(r.getAs[Boolean]("drifted") == (r.getAs[Double]("psi") > 0.2))
  }

  test("psi drift: identical populations score ~0, disjoint populations score high") {
    import graft.operators.Evolution
    // same uniform values on both sides of the weekday split → psi ≈ 0
    val ts = (ds: Int) => s"2024-01-0$ds 12:00:00" // Jan 1 2024 = Monday
    val same = (1 to 7).flatMap(dow => (1 to 50).map(i =>
      (ts(dow), i.toDouble))).toDF("ts_s", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("value"))
    val r0 = Evolution.psiDrift(same).head()
    assert(math.abs(r0.getAs[Double]("psi")) < 0.01, r0.toString)
    // weekday values near 0, weekend values near 100 → strong drift
    val drift = (1 to 7).flatMap(dow => (1 to 50).map(i =>
      (ts(dow), if (dow <= 4) i % 10 * 1.0 else 90.0 + i % 10)))
      .toDF("ts_s", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("value"))
    val r1 = Evolution.psiDrift(drift).head()
    assert(r1.getAs[Double]("psi") > 1.0, r1.toString)
    assert(r1.getAs[Boolean]("drifted"))
  }

  test("anomaly detector: weekly rhythm is not an anomaly; a planted spike is") {
    import java.time.LocalDate
    val start = LocalDate.parse("2024-01-01") // a Monday
    val rows = (0 until 28).flatMap { d =>
      val day = start.plusDays(d)
      val dow = day.getDayOfWeek.getValue // 1=Mon..7=Sun
      val base = if (dow >= 6) 50 else 100 // strong weekend rhythm
      val n = if (d == 9) 300 else base    // planted spike on a Wednesday
      (1 to n).map(_ => s"$day 12:00:00")
    }.toDF("ts_s").select(col("ts_s").cast("timestamp").as("ts"))
    val flagged = graft.operators.Analytics.dailyAnomalies(rows)
      .collect().map(_.getDate(0).toString)
    assert(flagged.toSeq == Seq("2024-01-10"),
      s"flagged $flagged — the weekly rhythm must be adjusted away")
  }

  test("data card: volumes partition the corpus; shares and medians are sane") {
    val docs = Tables.documents(spark, sfDir)
    val rows = graft.operators.Curation.queries("q_data_card")(spark, sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val (n, ppm, dppm) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("top_lang_ppm"), r.getAs[Long]("dup_ppm"))
      assert(ppm > 0 && ppm <= 1000000)
      assert(dppm >= 0 && dppm <= 1000000)
      assert(r.getAs[Long]("dup_docs") <= n)
      assert(r.getAs[Long]("p50_tokens") > 0)
      assert(r.getAs[Long]("tokens") >= r.getAs[Long]("p50_tokens") * (n / 2))
    }
    // per-source exact medians: recompute one source independently
    val src = rows.head.getAs[String]("source")
    val toks = docs.filter(col("source") === src)
      .select(graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(rows.head.getAs[Long]("p50_tokens") == toks((toks.length + 1) / 2 - 1))
  }

  test("target encoding: matches hand LOO recompute; excludes own label") {
    val rows = graft.operators.Training.queries("q_target_encode")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byT = ev.groupBy(_._2).map { case (t, rs) =>
      t -> (rs.length.toLong, rs.map(_._3).sum)
    }
    val (nn, ss) = (ev.length.toLong, ev.map(_._3).sum)
    val centsOf = ev.map(t => t._1 -> t._3).toMap
    rows.take(10).foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      val (nt, sc) = byT(t)
      val own = centsOf(id)
      val expect = BigDecimal(
        ((sc - own) * nn + 10L * ss).toDouble /
          ((nt - 1 + 10) * nn).toDouble / 100.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("te_loo") - expect) < 1e-9,
        s"event $id: ${r.getAs[Double]("te_loo")} vs $expect")
    }
  }

  test("skyline: bucket-pruned frontier equals brute-force dominance check") {
    val got = graft.operators.Curation.queries("q_skyline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute force over the same (a, b) projection
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("a"),
        round(size(array_distinct(
            graft.operators.TextAnalysis.tokens(lower(col("text")))))
          .cast("double") /
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("double"), 6)
          .as("b"))
      .filter(col("a") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val brute = all.filter { case (_, a, b) =>
      !all.exists { case (_, ea, eb) =>
        ea >= a && eb >= b && (ea > a || eb > b)
      }
    }.sortBy(_._1)
    assert(got.toSeq == brute.toSeq,
      s"pruned ${got.length} vs brute ${brute.length}")
    assert(got.nonEmpty && got.length < all.length / 2,
      "frontier should be a genuine shortlist")
  }

  test("forecast backtest: metrics internally consistent and finite") {
    val r = graft.operators.Analytics.queries("q_forecast_backtest")(spark, sfDir)
      .head()
    val (n, mae, naive, skill) = (r.getAs[Long]("n_days"),
      r.getAs[Double]("mae"), r.getAs[Double]("naive_mae"),
      r.getAs[Double]("skill_vs_naive"))
    assert(n > 10)
    assert(mae >= 0 && naive > 0 && r.getAs[Double]("mape_pct") >= 0)
    // skill is definitionally 1 − Σerr/Σnaive (6dp rounding slack)
    assert(math.abs(skill - (1.0 - mae / naive)) < 1e-3,
      s"skill $skill vs ${1.0 - mae / naive}")
  }

  test("neyman allocation: budget respected, high-variance strata earn above share") {
    val rows = graft.operators.Analytics.queries("q_neyman_alloc")(spark, sfDir)
      .collect()
    val neyman = rows.map(_.getAs[Long]("neyman_n")).sum
    val prop = rows.map(_.getAs[Long]("prop_n")).sum
    // floors: within one unit per stratum below the 1000 budget
    assert(neyman <= 1000 && neyman > 1000 - rows.length)
    assert(prop <= 1000 && prop > 1000 - rows.length)
    rows.foreach(r => assert(r.getAs[Double]("sigma") >= 0.0))
    // the designs genuinely differ unless all sigmas are equal
    assert(rows.exists(r =>
      r.getAs[Long]("neyman_n") != r.getAs[Long]("prop_n")))
  }

  test("negative sampling: k per anchor, no same-source leaks, rerun-stable") {
    val q = graft.operators.Curation.queries("q_negative_sample")
    val a = q(spark, sfDir).collect()
    val srcOf = Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byAnchor = a.groupBy(_.getLong(0))
    assert(byAnchor.size == 5)
    byAnchor.foreach { case (qid, rs) =>
      assert(rs.length == 5)
      rs.foreach { r =>
        val neg = r.getLong(1)
        assert(neg != qid)
        assert(srcOf(neg) != srcOf(qid), "same-source leak")
      }
    }
    val b = q(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("epoch shuffle: ranks contiguous per (epoch, shard); epochs decorrelated") {
    val rows = Training.queries("q_epoch_shuffle")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val docs = rows.filter(_._1 == 1L).map(_._3).toSet
    assert(rows.filter(_._1 == 2L).map(_._3).toSet == docs,
      "every epoch must cover the whole corpus")
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
      assert(g.map(_._4).sorted.toSeq == (1 to g.length).toSeq,
        "rank_in_shard must be contiguous 1..n within (epoch, shard)")
    }
    // the shuffle is epoch-keyed: shard assignment must differ between
    // epochs for a substantial fraction of docs (md5 decorrelates)
    val s1 = rows.filter(_._1 == 1L).map(t => t._3 -> t._2).toMap
    val s2 = rows.filter(_._1 == 2L).map(t => t._3 -> t._2).toMap
    val moved = docs.count(d => s1(d) != s2(d))
    assert(moved > docs.size / 2, s"only $moved/${docs.size} docs moved shard")
  }
}
