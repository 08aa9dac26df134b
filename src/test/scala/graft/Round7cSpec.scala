package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Evolution, Retrieval, TextAnalysis}

/** Round-7 continuation (session c): winnowing fingerprints, Zipf fit,
  * normalized dedup, DP counts, rendezvous sharding, NB lang-id,
  * retrieval metrics.
  */
class Round7cSpec extends SparkSpec {
  import spark.implicits._

  test("normalized dedup catches reformatted copies exact dedup misses") {
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "The, quick... BROWN fox!!"), // same after normalization
      (2L, "the quick brown fox"),       // raw exact duplicate of 0
      (3L, "something else entirely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.normalizedDedupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(pairs.toSet == Set((1L, 0L, false), (2L, 0L, true)))
  }

  test("dp counts: reproducible Laplace noise, bounded and non-trivial") {
    val q = Evolution.queries("q_dp_counts")
    val a = q(spark, sfDir).collect()
    val b = q(spark, sfDir).collect() // deterministic noise: identical
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.foreach { r =>
      val (n, noisy) = (r.getAs[Long]("n_exact"), r.getAs[Double]("n_noisy"))
      // |Laplace(1)| from u in (0,1) off the 52-bit grid is < 37 nats
      assert(math.abs(noisy - n) < 37.0)
    }
    // the mechanism actually perturbs (not an identity passthrough)
    assert(a.exists(r =>
      math.abs(r.getAs[Double]("n_noisy") - r.getAs[Long]("n_exact")) > 1e-6))
  }

  test("rendezvous resharding moves ~1/9 of keys; mod-hash ~8/9") {
    val r = Curation.queries("q_rendezvous_shard")(spark, sfDir).head()
    val hrw = r.getAs[Long]("hrw_moved_ppm")
    val mod = r.getAs[Long]("mod_moved_ppm")
    assert(hrw > 40000 && hrw < 220000, s"hrw ppm $hrw not near 1/9")
    assert(mod > 700000, s"mod ppm $mod not near 8/9")
    assert(r.getAs[Long]("hrw_min_shard") > 0)
  }

  test("NB lang-id: confusion matrix partitions the labeled corpus") {
    val rows = TextAnalysis.queries("q_langid_nb")(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    val perLang = docs.filter(col("lang").isNotNull)
      .filter(size(TextAnalysis.tokens(lower(col("text")))) > 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getAs[Long]("n")).sum }
    assert(got == perLang, "row sums must equal docs per true lang")
    val langs = perLang.keySet
    rows.foreach(r => assert(langs.contains(r.getString(1))))
  }

  test("retrieval metrics are internally consistent on the corpus") {
    val r = Retrieval.queries("q_retrieval_metrics")(spark, sfDir).head()
    val (nRel, nHits) = (r.getAs[Long]("n_relevant"), r.getAs[Long]("n_hits"))
    val (p, mrr, ndcg) = (r.getAs[Double]("precision_at_k"),
      r.getAs[Double]("mrr"), r.getAs[Double]("ndcg_at_k"))
    assert(nHits <= 10 && nHits <= nRel)
    assert(math.abs(p - nHits / 10.0) < 1e-9)
    assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
    if (nHits > 0) assert(mrr >= 1.0 / 10 - 1e-9 && mrr <= 1.0)
    else assert(mrr == 0.0)
  }

  test("retrieval metrics: perfect ranking scores 1.0 across the board") {
    // 3 docs contain all of the 3 most-frequent non-stopword terms; the
    // rest contain none. BM25 must rank the relevant 3 on top ->
    // precision@10 = 3/10 capped by n_relevant, mrr = 1, ndcg = 1.
    val relText = "alpha beta gamma alpha beta gamma"
    val docs = (
      (0 until 3).map(i => (i.toLong, s"$relText filler$i")) ++
      (3 until 30).map(i => (i.toLong, s"noise${i}a noise${i}b noise${i}c"))
    ).toDF("doc_id", "text")
    val r = Retrieval.retrievalMetrics(docs).head()
    assert(r.getAs[Long]("n_relevant") == 3L)
    assert(r.getAs[Long]("n_hits") == 3L)
    assert(math.abs(r.getAs[Double]("mrr") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ndcg_at_k") - 1.0) < 1e-6)
  }

  test("winnow guarantee: docs sharing >= w+k-1 tokens share a fingerprint") {
    // k=3, w=4 -> any common run of 6 tokens must yield a common selected
    // fingerprint (Schleimer 2003, theorem 1). The shared run sits at
    // different offsets in each doc to prove position robustness.
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (0L, s"one two three $shared four five"),
      (1L, s"$shared six seven eight nine ten eleven"),
      (2L, "totally different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnow(docs).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.map(_.getAs[Long]("fp")).toSet
      }
    assert((fps(0L) & fps(1L)).nonEmpty, "shared 6-token run must collide")
    assert((fps(0L) & fps(2L)).isEmpty, "disjoint docs must not collide")
  }

  test("winnow density and full-window rule") {
    // 40 distinct tokens -> m = 38 grams; expected selected ~ 2m/(w+1).
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val one = Seq((0L, text)).toDF("doc_id", "text")
    val sel = TextAnalysis.winnow(one).collect()
    val m = 38
    assert(sel.length >= m / 4 && sel.length <= m,
      s"selected ${sel.length} of $m grams — density off")
    // every selected position is a valid gram start
    sel.foreach(r => assert(r.getInt(1) >= 1 && r.getInt(1) <= m))
    // short doc (m < w): still emits at least one fingerprint
    val short = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.winnow(short).count() == 1L)
  }

  test("zipf fit recovers the exponent of a planted power law") {
    // corpus where term r appears round(4000 / r^1.5) times, r = 1..60:
    // the fit must recover exponent ~1.5 with near-perfect r2.
    val text = (1 to 60).flatMap { r =>
      val n = math.max(1, math.round(4000.0 / math.pow(r, 1.5)).toInt)
      Seq.fill(n)(f"w$r%03d")
    }.mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val fit = TextAnalysis.zipfFit(docs).head()
    assert(fit.getAs[Long]("n_terms") == 60L)
    val exp = fit.getAs[Double]("zipf_exponent")
    // rounding freq to integers + the max(1,_) floor flattens the deep
    // tail slightly; the recovered exponent still sits near 1.5
    assert(exp > 1.2 && exp < 1.7, s"exponent $exp")
    assert(fit.getAs[Double]("r2") > 0.95)
  }
}
