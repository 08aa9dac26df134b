package graft

import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the session-5 operators: empty frames
  * and one-sided populations must degrade (empty result / null stats),
  * never throw — the q_stream_psi ADVICE-r8 lesson applied up front.
  */
class Round9dSpec extends SparkSpec {
  import spark.implicits._

  private val emptyEvents = Seq.empty[(Long, String, Double, String)]
    .toDF("event_id", "event_type", "value", "s")
    .select(col("event_id"), col("event_type"), col("value"),
      to_timestamp(col("s")).as("ts"))

  test("mcnemar: an empty stream yields the null/zero table, no throw") {
    // global sums over ZERO rows are NULL on both engines (count is 0)
    val r = operators.Analytics.mcnemar(emptyEvents).collect()(0)
    assert(r.getAs[Long]("n") === 0L)
    assert(r.isNullAt(r.fieldIndex("both_correct")))
    // 0/0 accuracies surface as non-finite/null, never an exception
  }

  test("tostEquivalence: empty arms do not throw") {
    val r = operators.Analytics.tostEquivalence(emptyEvents).collect()(0)
    assert(r.isNullAt(r.fieldIndex("n_a")))
    assert(r.isNullAt(r.fieldIndex("n_b")))
  }

  test("mmdDrift: a one-sided population yields null mmd2, no throw") {
    val emb = Seq((1L, Seq(1f, 2f), 0), (2L, Seq(3f, 4f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = operators.Similarity.mmdDrift(emb, col("label") < 5)
      .collect()(0)
    assert(r.getAs[Long]("n_ref") === 2L)
    assert(r.getAs[Long]("n_cur") === 0L)
    assert(r.isNullAt(r.fieldIndex("mmd2")))
  }

  test("macroF1: an all-null-label corpus returns an empty report") {
    val docs = Seq((1L, "the and", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    assert(operators.TextAnalysis.macroF1(docs).collect().isEmpty)
  }

  test("wilcoxonSigned: all-zero diffs return null z, not a throw") {
    // purchase and click sums equal every day -> every diff drops
    val rows = (1 to 3).flatMap { d0 =>
      Seq((d0.toLong * 2, "purchase", 10.0, f"2024-07-$d0%02d 10:00:00"),
        (d0.toLong * 2 + 1, "click", 10.0, f"2024-07-$d0%02d 11:00:00"))
    }
    val ev = rows.toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.wilcoxonSigned(ev).collect()(0)
    // every diff drops -> the rank frame is empty -> null sums, null z
    assert(r.isNullAt(r.fieldIndex("n_pairs")))
    assert(r.isNullAt(r.fieldIndex("z")))
  }

  test("repNgrams: an empty corpus returns no rows, no throw") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(operators.TextAnalysis.repNgrams(docs).collect().isEmpty)
  }

  test("goodTuring: a hapax-free corpus yields null r1_star") {
    // every token appears twice -> N1 = 0
    val docs = Seq((1L, "a a b b")).toDF("doc_id", "text")
    val r = operators.TextAnalysis.goodTuring(docs).collect()(0)
    assert(r.getAs[Long]("n1") === 0L)
    assert(r.getAs[Double]("p_unseen") === 0.0)
    assert(r.isNullAt(r.fieldIndex("r1_star")))
  }

  test("mixGof: hand-computed chi-square on a planted 50/25/25 mix") {
    // uniform target e = 100/3: chi2 = (50-e)^2/e + 2*(25-e)^2/e
    //  = (2500/9 + 2*625/9) / (100/3) = (3750/9)*(3/100) = 12.5
    val docs = Seq(
      (1L, ("w " * 50).trim, "s1"), (2L, ("w " * 25).trim, "s2"),
      (3L, ("w " * 25).trim, "s3"))
      .toDF("doc_id", "text", "source")
    val r = operators.Curation.mixGof(docs).collect()(0)
    assert(r.getAs[Long]("n_sources") === 3L)
    assert(r.getAs[Long]("dof") === 2L)
    assert(math.abs(r.getAs[Double]("chi2") - 12.5) < 1e-6)
    // s1 share 500000 vs target 333333 -> dev 166667
    assert(r.getAs[Long]("max_dev_ppm") === 166667L)
  }

  test("mixGof: a perfectly uniform mix scores zero") {
    val docs = Seq((1L, "a b", "s1"), (2L, "c d", "s2"))
      .toDF("doc_id", "text", "source")
    val r = operators.Curation.mixGof(docs).collect()(0)
    assert(r.getAs[Double]("chi2") === 0.0)
    assert(r.getAs[Long]("max_dev_ppm") === 0L)
  }

  test("aucDelongCi: a single positive yields null se/CI, never NaN") {
    // n_pos = 1 makes the (n1-1) placement-variance divisor zero; the
    // contract is the null CI (nbFit/wilcoxonSigned precedent), not
    // NaN/Infinity leaking into the readout
    val docs = Seq((1L, 10L, "en"), (2L, 5L, "fr"), (3L, 7L, "fr"),
      (4L, 3L, "fr"))
      .toDF("doc_id", "n_chars", "lang")
    val r = operators.Analytics
      .aucDelongCi(docs, col("n_chars"), col("lang") === "en").collect()(0)
    assert(r.getAs[Long]("n_pos") === 1L)
    assert(r.getAs[Long]("n_neg") === 3L)
    assert(r.getAs[Double]("auc") === 1.0) // the point estimate survives
    assert(r.isNullAt(r.fieldIndex("se_delong")))
    assert(r.isNullAt(r.fieldIndex("ci_lo")))
    assert(r.isNullAt(r.fieldIndex("ci_hi")))
  }

  test("mcnemar: null-ts rows are excluded so cells sum to n") {
    val ev = Seq(
      (1L, "purchase", 60.0, "2024-07-01 10:00:00"),
      (2L, "click", 10.0, "2024-07-01 11:00:00"),
      (3L, "purchase", 70.0, null.asInstanceOf[String]))
      .toDF("event_id", "event_type", "value", "s")
      .select(col("event_id"), col("event_type"), col("value"),
        to_timestamp(col("s")).as("ts"))
    val r = operators.Analytics.mcnemar(ev).collect()(0)
    assert(r.getAs[Long]("n") === 2L)
    val cells = Seq("both_correct", "a_only", "b_only", "both_wrong")
      .map(r.getAs[Long](_)).sum
    assert(cells === r.getAs[Long]("n"))
  }

  test("cemAtt: no matched strata yields a null-safe zero estimate") {
    // one all-treated stratum, one all-control stratum -> 0 matched
    val orders = Seq(
      ("1-URGENT", "O", java.sql.Date.valueOf("2024-01-05"), 10.0),
      ("5-LOW", "F", java.sql.Date.valueOf("2024-04-05"), 20.0))
      .toDF("o_orderpriority", "o_orderstatus", "o_orderdate",
        "o_totalprice")
    val r = operators.Analytics.cemAtt(orders).collect()(0)
    assert(r.getAs[Long]("n_strata_matched") === 0L)
    assert(r.getAs[Long]("n_treated") === 0L)
    // the un-guarded version threw DIVIDE_BY_ZERO here under ANSI;
    // the contract is a null estimand
    assert(r.isNullAt(r.fieldIndex("att")))
  }
}
