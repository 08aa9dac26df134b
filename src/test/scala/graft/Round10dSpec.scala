package graft

import org.apache.spark.sql.functions._

/** Hand-computed gates for the round-10 batch-C operators: Yule's K,
  * daily CCF, price elasticity, SAX motifs, and the raw-event CMS build
  * used by the streaming twin.
  */
class Round10dSpec extends SparkSpec {
  import spark.implicits._

  // ---- Yule's K ---------------------------------------------------------

  test("yuleK: textbook frequency spectrum (a a a b b c)") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val r = operators.TextAnalysis.yuleK(docs).collect()(0)
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[Long]("vocab") === 3L)
    assert(math.abs(r.getAs[Double]("ttr") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("hapax_share") - 1.0 / 3) < 1e-6)
    // K = 1e4 * (14 - 6) / 36 = 2222.222222
    assert(math.abs(r.getAs[Double]("yule_k") - 2222.222222) < 1e-5)
  }

  // ---- CCF ---------------------------------------------------------------

  test("ccfDaily: purchases lagging clicks by 2 days peak at lag +2") {
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00")
    // X_t: a deterministic wiggle; clicks = X_t, purchases = X_{t-2}
    def x(t: Int) = 100.0 + 37.0 * ((t * 7919) % 13)
    val rows = (0 until 28).flatMap { t =>
      Seq((ts(t), "click", x(t)), (ts(t), "purchase", x(t - 2)))
    }
    val ccf = operators.Analytics
      .ccfDaily(rows.toDF("ts", "event_type", "value")).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("ccf")).toMap
    assert(ccf(2) > 0.99)
    val best = ccf.maxBy(_._2)
    assert(best._1 === 2)
  }

  // ---- price elasticity -----------------------------------------------------

  test("priceElasticity: planted -2 power law is recovered") {
    // unit price u in {1,2,4,8,16}; quantity = 10000 / u^2
    val rows = Seq(1.0, 2.0, 4.0, 8.0, 16.0).flatMap { u =>
      val q = 10000.0 / (u * u)
      (1 to 3).map(_ => (q, u * q)) // l_quantity, l_extendedprice
    }
    val r = operators.Analytics
      .priceElasticity(rows.toDF("l_quantity", "l_extendedprice"))
      .collect()(0)
    assert(r.getAs[Long]("n_rows") === 15L)
    assert(math.abs(r.getAs[Double]("elasticity") - -2.0) < 0.01)
    assert(r.getAs[Double]("r2") > 0.999)
  }

  // ---- SAX motifs --------------------------------------------------------------

  test("saxMotifs: a low/mid/high weekly cycle yields the abc motif") {
    def day(i: Int) = {
      val c = java.util.Calendar.getInstance()
      c.set(2024, 0, 1, 0, 0, 0)
      c.add(java.util.Calendar.DAY_OF_MONTH, i)
      new java.sql.Timestamp(c.getTimeInMillis)
    }
    // 9 complete weeks cycling daily revenue 10/20/30 dollars
    val rows = (0 until 63).map(i => (day(i), 10.0 * (i / 7 % 3 + 1)))
    val motifs = operators.Analytics
      .saxMotifs(rows.toDF("o_orderdate", "o_totalprice")).collect()
    assert(motifs.head.getAs[String]("motif") === "abc")
    assert(motifs.head.getAs[Long]("n") === 3L)
    assert(motifs.map(_.getAs[Long]("n")).sum === 7L) // 9 weeks -> 7 trigrams
  }

  // ---- KN discount guard (the sf0.1 ANSI 0/0 regression) -----------------

  test("knLmTopK: a corpus with no rare bigrams discounts D=0, not 0/0") {
    // "a b a b a b a b" has (a,b) x4 and (b,a) x3 -> no bigram count in
    // {1, 2} -> n1 = n2 = 0 -> D = 0 and the model degenerates to the ML
    // estimate (this aborted at sf0.1 before the guard: ANSI double
    // division throws on 0/0).
    val docs = Seq((1L, "a b a b a b a b", "s"),
      (2L, "c d c d c d c d", "s")).toDF("doc_id", "text", "source")
    val top = operators.TextAnalysis.knLmTopK(docs).collect()
    assert(top.nonEmpty)
    val ab = top.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getAs[Double]("discount") === 0.0)
    // ML estimate: c(a,b)/c(a,.) = 4/4 = 1
    assert(math.abs(ab.getAs[Double]("p_kn") - 1.0) < 1e-9)
  }

  // ---- CMS raw-event build ≡ key-frame build -----------------------------------

  test("countMin cells built from raw rows equal the key-frame build") {
    // the streaming twin builds cells from raw events; batch builds them
    // from the exact key frame — same totals, so cmsProbe must agree.
    val items = (Seq.fill(40)(7L) ++ Seq.fill(11)(3L) ++ (100L to 130L))
      .toDF("k")
    val batch = operators.Sketches.countMin(items, "k", k = 5).collect()
    val rawCells = items
      .select(explode(array((0 until 4).map(r =>
        struct(lit(r).as("r"),
          operators.Sketches.cmsBucket(r, col("k")).as("bucket"))): _*))
        .as("p"))
      .groupBy(col("p.r").as("r"), col("p.bucket").as("bucket"))
      .agg(count(lit(1)).as("cell"))
    val exact = items.groupBy(col("k").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val viaRaw = operators.Sketches.cmsProbe(rawCells, exact, 4, 5).collect()
    assert(batch.map(_.toString).toSeq === viaRaw.map(_.toString).toSeq)
  }
}
