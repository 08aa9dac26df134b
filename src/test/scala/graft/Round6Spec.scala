package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-6 additions: constant-cost BPE merge loop, Misra-Gries streaming
  * heavy hitters, and connected-component lineage truncation.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  test("BPE training: plan depth is constant across merge iterations") {
    // 8 distinct high-frequency bigrams so 6 iterations never exhaust.
    val docs = (0 until 8).map { i =>
      val x = ('a' + i).toChar
      (i.toLong, Seq.fill(20 - i)(s"${x}a ${x}b").mkString(" "))
    }.toDF("doc_id", "text")
    def corpusPlanNodes(k: Int): Int = {
      val (_, corpus) = TextAnalysis.bpeTrainWithCorpus(spark, docs, k)
      corpus.queryExecution.optimizedPlan.collect { case p => p }.size
    }
    val d2 = corpusPlanNodes(2)
    val d6 = corpusPlanNodes(6)
    // Without per-iteration localCheckpoint the k=6 plan carries four more
    // fold/split layers than k=2; with it both are a scan of the latest
    // checkpoint.
    assert(d6 == d2, s"plan grew with iterations: k=2 -> $d2 nodes, k=6 -> $d6")
    assert(d2 <= 2, s"checkpointed corpus plan should be a bare scan, got $d2 nodes")
  }

  test("BPE training: k=10 merge table matches the k=3 prefix (checkpoint preserves semantics)") {
    val docs = Seq((1L, "the cat sat on the cat mat"), (2L, "the cat is the cat"),
      (3L, "go go go"), (4L, "the cat sat down")).toDF("doc_id", "text")
    val m3 = TextAnalysis.bpeTrain(spark, docs, 3)
      .as[(Long, String, String, Long)].collect().toSeq
    val m6 = TextAnalysis.bpeTrain(spark, docs, 6)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(m6.take(m3.length) == m3)
    assert(m3.head == ((1L, "the", "cat", 5L)))
  }
}
