package graft

import graft.operators.{Evolution, Retrieval}
import org.apache.spark.sql.functions._

/** Retrieval (inverted index, BM25) + dataset-evolution (diff, cumulative
  * reach) semantics on hand-built frames where the expected answer is
  * checkable by eye.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("inverted index: df counts distinct docs, postings capped and sorted") {
    val docs = Seq(
      (1L, "alpha beta alpha"), // alpha counted once for df despite tf=2
      (2L, "alpha gamma"),
      (3L, "beta beta"),
      (4L, "alpha")
    ).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, topTerms = 2, postingsK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // alpha df=3 (docs 1,2,4), beta df=2 (docs 1,3); postings keep the 2
    // SMALLEST doc_ids in ascending order
    assert(idx.toSeq == Seq(("alpha", 3L, "1,2"), ("beta", 2L, "1,3")))
  }

  test("bm25: higher tf ranks higher at equal length; longer doc penalized") {
    // one query term ("querz" — rarest non-stopword won't be picked; force
    // determinism by making corpus where top-3 non-stopword df terms are
    // known). Terms: zzz appears in all docs (df max), each doc same text
    // apart from tf of zzz and filler length.
    val docs = Seq(
      (1L, "zzz zzz pad1 pad2"),  // tf=2, dl=4
      (2L, "zzz pad3 pad4 pad5"), // tf=1, dl=4
      (3L, "zzz zzz pad6 pad7 pad8 pad9 pad10 pad11") // tf=2, dl=8
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, nQueryTerms = 1, k = 3)
      .collect().map(_.getLong(0))
    // doc1 (tf=2, short) > doc3 (tf=2, long) > doc2 (tf=1, short)
    assert(out.toSeq == Seq(1L, 3L, 2L))
  }

  test("rrf fusion: doc present in both rankings outranks single-list docs") {
    // corpus: doc 1 is both BM25-best (max tf of the top query term) AND
    // longest (n_chars max); docs 2..4 split the two signals
    val docs = Seq(
      (1L, "zzz zzz zzz pad pad pad pad pad pad", 900L),
      (2L, "zzz zzz zzz zzz", 100L), // strong bm25, short
      (3L, "pad pad pad pad pad pad pad pad", 800L), // long, no query term
      (4L, "zzz pad", 50L)
    ).toDF("doc_id", "text", "n_chars")
    val out = Retrieval.rrfFusion(docs, topN = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // doc1 fuses two reciprocal ranks; every other doc has at most one
    // top-2 position, so doc1 must lead
    assert(out.head._1 == 1L)
    assert(out.head._2 > out(1)._2)
  }

  test("silhouette margin is positive for well-separated label clusters") {
    val rows = (0 until 12).map { i =>
      val label = i % 3
      val base = Array.fill(6)(0.0f)
      base(label) = 10.0f
      base((label + 3) % 6) = if (i < 6) 0.5f else -0.5f
      (i.toLong, base.toSeq, label)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.silhouette(emb).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Long]("n") == 4L)
      assert(r.getAs[Double]("avg_margin") > 0.5)
    }
  }

  test("plan shapes: postings on the partial/final top-k exec, no cartesian anywhere") {
    val docs = Tables.documents(spark, sfDir)
    val idx = Retrieval.invertedIndex(docs).queryExecution.executedPlan.toString
    // the posting cap must run as the partial/final native exec pair —
    // a regression to collect_list+slice would buffer df-sized state
    assert(idx.contains("TopKPerKeyPartial"), "postings not on the partial heap exec")
    assert(idx.contains("TopKPerKey"), "postings not on the native exec")
    for ((name, df) <- Seq(
        "bm25" -> Retrieval.bm25TopK(docs),
        "rrf" -> Retrieval.rrfFusion(docs),
        "diff" -> Evolution.tableDiff(Tables.orders(spark, sfDir)),
        "bootstrap" -> SparkEntry.queries("q_bootstrap_ci")(spark, sfDir),
        "attribution" -> SparkEntry.queries("q_attribution")(spark, sfDir))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plan has a cartesian product")
    }
    // the bootstrap's replicate fold must partial-aggregate map-side:
    // the shuffle carries (b, partial-sum) pairs, never exploded rows
    val bp = SparkEntry.queries("q_bootstrap_ci")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(bp.contains("partial_"), "bootstrap replicate fold not map-side combined")
  }

  test("table diff classifies added/removed/changed/unchanged exhaustively") {
    // keys: 7 → changed, 11 → removed (absent from B), 13 → added (absent
    // from A), 1 → unchanged. 77 = 7×11 → in A only (removed wins: absent
    // from B before the price bump can matter).
    val orders = Seq(1L, 7L, 11L, 13L, 77L)
      .map(k => (k, "O", 100.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val got = Evolution.tableDiff(orders)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("added" -> 1L, "removed" -> 2L, "changed" -> 1L,
      "unchanged" -> 1L))
  }

  test("expectations: violations counted per rule in one pass, null counts as violation") {
    val df = Seq(
      (5.0, "A"), (60.0, "A"), (10.0, null.asInstanceOf[String])
    ).toDF("qty", "flag")
    val out = Evolution.expectations(df, Seq(
        "qty_ok" -> col("qty").between(1, 50),
        "flag_ok" -> col("flag").isin("A", "B")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // qty: 60 violates (1); flag: null coalesces to violation (1)
    assert(out.toSeq == Seq(
      ("flag_ok", 1L, 3L, false), ("qty_ok", 1L, 3L, false)))
  }

  test("freshness lag is floored whole minutes behind the freshest key") {
    val events = Seq(
      ("a", "2024-01-01 10:00:00"), ("b", "2024-01-01 09:58:30")
    ).toDF("event_type", "s").withColumn("ts", to_timestamp($"s"))
    val lags = Evolution.freshness(events)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(lags == Map("a" -> 0L, "b" -> 1L)) // 90 s → 1 whole minute
  }

  test("cumulative distinct users: each user counted once, at first day") {
    val events = Seq(
      (10L, "2024-01-01 10:00:00"),
      (10L, "2024-01-02 10:00:00"), // repeat user: not new on day 2
      (20L, "2024-01-02 11:00:00"),
      (30L, "2024-01-03 09:00:00")
    ).toDF("user_id", "s").withColumn("ts", to_timestamp($"s"))
    val rows = Evolution.cumulativeDistinctUsers(events)
      .select(col("d").cast("string"), col("new_users"), col("cum_users"))
      .as[(String, Long, Long)].collect()
    assert(rows.toSeq == Seq(
      ("2024-01-01", 1L, 1L), ("2024-01-02", 1L, 2L), ("2024-01-03", 1L, 3L)))
  }
}
