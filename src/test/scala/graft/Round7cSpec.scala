package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-7 continuation (session c): winnowing fingerprints, Zipf fit. */
class Round7cSpec extends SparkSpec {
  import spark.implicits._

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
