package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Round-7 additions: cross-load incremental dedup (VERDICT r6 #5). */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  test("incremental dedup drops planted cross-load overlaps, keeps the rest") {
    // hermetic corpus: per-doc disjoint vocab, so the ONLY matches are the
    // planted ones (the real documents table contains natural cross-load
    // near-dups — covered by the q_dedup_incremental oracle instead)
    def doc(i: Int): String = (0 until 8).map(t => s"tok${i}w$t").mkString(" ")
    val l1 = (1 to 100).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val l2base = (201 to 300).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val exactCopies = (1 to 10).map(i => (400L + i, doc(i))).toDF("doc_id", "text")
    val nearCopies = (11 to 20).map(i => (500L + i, doc(i) + " appended"))
      .toDF("doc_id", "text") // shingle jaccard 6/7 ≈ 0.86 ≥ 0.5
    val l2 = l2base.unionByName(exactCopies).unionByName(nearCopies)

    val store = Dedup.buildFingerprintStore(l1) // xxhash fast path
    val surv = Dedup.incrementalDedup(l2, store)

    // physical plan: candidate generation must be band-key equi-joins
    val physical = surv.queryExecution.executedPlan.toString
    assert(!physical.contains("Cartesian"), "all-pairs join in incremental dedup")

    val ids = surv.select("doc_id").as[Long].collect().toSet
    assert(ids == (201L to 300L).toSet,
      s"exactly the base load-2 docs must survive, got $ids")
  }

  test("incremental dedup on the real corpus: planted overlaps never survive") {
    val docs = Tables.documents(spark, sfDir)
    val l1 = docs.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 3 =!= 0 && col("doc_id") < 30)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val l2base = docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text")
    val l2 = l2base.unionByName(planted)
    val surv = Dedup.incrementalDedup(l2, Dedup.buildFingerprintStore(l1))
    val ids = surv.select("doc_id").as[Long].collect().toSet
    assert(!ids.exists(_ >= 10000000L), "planted exact copies must all drop")
    // natural cross-load near-dups exist in the generated corpus, so only
    // containment holds for the base docs (exact set parity is the DuckDB
    // oracle's job at every SF)
    val base = l2base.select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(base), "survivors must come from the base load")
  }

  test("incremental dedup is idempotent: re-running the appended store drops all") {
    val docs = Tables.documents(spark, sfDir)
    val l1 = docs.filter(col("doc_id") % 3 =!= 0).select("doc_id", "text")
    val l2 = docs.filter(col("doc_id") % 3 === 0).select("doc_id", "text")
    val store1 = Dedup.buildFingerprintStore(l1)
    val surv = Dedup.incrementalDedup(l2, store1)
    // append the survivors' store rows (the documented load-completion step)
    val store2 = store1.unionByName(
      Dedup.buildFingerprintStore(
        l2.join(surv.select("doc_id"), Seq("doc_id"), "left_semi")))
    assert(Dedup.incrementalDedup(l2, store2).count() == 0L,
      "replaying the same load against the appended store must drop every doc")
  }

  test("in-batch exact dups collapse before the store ever sees them") {
    val batch = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // in-batch exact dup of 1
      (3L, "completely different content here")).toDF("doc_id", "text")
    val store = Dedup.buildFingerprintStore(
      Seq((100L, "unrelated stored document text")).toDF("doc_id", "text"))
    val ids = Dedup.incrementalDedup(batch, store)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L), s"min-id survivor per fp expected, got $ids")
  }
}
