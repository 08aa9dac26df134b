package graft

import graft.functions.{CountMin, CountMinAggregator}
import graft.operators.{Dedup, SqlSurface, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-5 additions: count-min sketch contract, fuzzy-match blocking,
  * rare-bigram edge cases, and the SQL-surface pack's semantics.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  test("count-min: merge order never changes the sketch, estimates never under-count") {
    val agg = new CountMinAggregator(4, 64)
    val data = Seq.tabulate(500)(i => s"k${i % 7}")
    // sequential build vs two split builds merged both ways
    val whole = data.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = data.splitAt(137)
    val a = l.foldLeft(agg.zero)(agg.reduce)
    val b = r.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a.clone(), b.clone()).toSeq == whole.toSeq)
    assert(agg.merge(b.clone(), a.clone()).toSeq == whole.toSeq)
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (k, n) =>
      assert(CountMin.estimate(whole.toSeq, 4, 64, k) >= n)
    }
    // an unseen key can only read colliding mass, never negative
    assert(CountMin.estimate(whole.toSeq, 4, 64, "absent") >= 0L)
  }

  test("fuzzy match: prefix- and suffix-blocked pairs both surface with exact distance") {
    val rows = Seq((1L, "red bolt"), (2L, "old bolt"), (3L, "red belt"),
      (4L, "widget"), (5L, "completely different"))
      .toDF("p_partkey", "p_name")
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    rows.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Dedup.queries("q_fuzzy_match")(spark, dir)
      .select("name_a", "name_b", "dist").as[(String, String, Long)].collect().toSet
    // "red bolt"→"old bolt" shares only the 3-char SUFFIX block (edit in
    // the prefix); "red bolt"→"red belt" shares only the PREFIX block —
    // both must be found, proving the two-key union does its job
    assert(got.contains(("old bolt", "red bolt", 2L)))
    assert(got.contains(("red belt", "red bolt", 1L)))
    assert(!got.exists(p => p._1 == "widget" || p._2 == "widget"))
  }

  test("rare bigrams: sub-2-char docs yield zero counts, not errors or drops") {
    val docs = Seq((1L, "aaaa aaaa aaaa"), (2L, "a"), (3L, ""), (4L, "aaQZ"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("rare").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("q_rare_bigrams")(spark, dir)
      .as[(Long, Long, Long)].collect().map { case (id, n, _) => (id, n) }.toMap
    assert(got == Map(1L -> 13L, 2L -> 0L, 3L -> 0L, 4L -> 3L))
  }

  test("BPE training: argmax order, greedy non-overlap, merged tokens keep merging") {
    val docs = Seq((1L, "the cat sat on the cat mat"), (2L, "the cat is the cat"),
      (3L, "go go go"), (4L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(spark, docs, 3)
      .as[(Long, String, String, Long)].collect().toSeq
    // step 1: (the,cat) ×4 wins. step 2: (go,go) ×2 pre-merge; greedy
    // left-to-right turns "go go go" into [go_go, go] (non-overlap).
    // step 3: every remaining pair has count 1 → lexicographic tie-break
    // on (a,b) picks (go_go, go) — "go_go" sorts before "is"/"on"/"sat"/
    // "the_cat" — proving a MERGED token participates in later merges.
    assert(got(0) == ((1L, "the", "cat", 4L)))
    assert(got(1) == ((2L, "go", "go", 2L)))
    assert(got(2) == ((3L, "go_go", "go", 1L)))
  }

  test("window analytics: rank family is deterministic and frame-correct") {
    val df = SqlSurface.queries("q_window_analytics")(spark, sfDir)
    val one = df.filter(col("o_custkey") === df.select("o_custkey").head.getLong(0))
      .orderBy("seq").collect()
    // seq is 1..n dense; first_ok constant at the head key; last_ok at the
    // tail key regardless of current row (unbounded-following frame)
    assert(one.map(_.getAs[Long]("seq")).toSeq == (1L to one.length).toSeq)
    assert(one.forall(_.getAs[Long]("first_ok") == one.head.getAs[Long]("o_orderkey")))
    assert(one.forall(_.getAs[Long]("last_ok") == one.last.getAs[Long]("o_orderkey")))
    assert(one.head.isNullAt(one.head.fieldIndex("days_since_prev")))
  }

  test("set ops: intersect and except partition the F-status customer set") {
    val df = SqlSurface.queries("q_set_ops")(spark, sfDir).cache()
    val both = df.filter(col("op") === "both").count()
    val fOnly = df.filter(col("op") === "f_only").count()
    val fAll = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").select("o_custkey").distinct().count()
    assert(both + fOnly == fAll)
    df.unpersist()
  }
}
