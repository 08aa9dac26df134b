package graft

import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.functions._

/** Curation semantics: decontamination recall/precision on planted
  * overlap, PII redaction correctness, mix-rate arithmetic.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags exactly the docs sharing an eval n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),      // contains eval 5-gram
      (2L, "alpha beta gamma delta DIFFERENT zeta"),    // breaks every 5-gram
      (3L, "one two three four five six seven"),        // disjoint
      (4L, "x alpha beta gamma delta epsilon tail")     // shifted overlap
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val flagged = Curation.contaminationReport(corpus, ev)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 4L))
    assert(flagged(1L) == 1 && flagged(4L) == 1)
    // hash-family parity: md5 family flags the same docs
    val flaggedMd5 = Curation.contaminationReport(corpus, ev, hasher = Dedup.Md5Hash)
      .collect().map(_.getLong(0)).toSet
    assert(flaggedMd5 == Set(1L, 4L))
  }

  test("pii redaction masks every planted class and only those") {
    val docs = Seq(
      (1L, "write to a.b-c_d@mail-host.co.uk and 555-000-1111 from 10.0.0.255"),
      (2L, "no pii here, just 1234 and a.dot."),
      (3L, "two mails x@y.io z@w.ai")
    ).toDF("doc_id", "text")
    val a = Curation.piiAudit(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(a(1L) == ((1, 1, 1)))
    assert(a(2L) == ((0, 0, 0)))
    assert(a(3L) == ((2, 0, 0)))
    val red = docs.filter($"doc_id" === 1L)
      .select(Curation.redact($"text")).as[String].head()
    assert(red == "write to [EMAIL] and [PHONE] from [IP]")
  }

  test("source mix shares sum to 1 and rates flatten to the target") {
    val mix = Curation.sourceMix(Tables.documents(spark, sfDir)).collect()
    val shareSum = mix.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    // applying the rates caps every source at the uniform target share
    val n = mix.length
    mix.foreach { r =>
      val eff = r.getAs[Double]("token_share") * r.getAs[Double]("sample_rate")
      assert(eff <= 1.0 / n + 1e-6)
    }
  }
}
