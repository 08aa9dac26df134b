package graft.tools

import graft.Tables
import graft.functions.NativeExpressions
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage-by-stage timings of the near-dup pipelines (md5
  * oracle family — the flavor the gated queries run).
  */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Dedup.plantedCorpus(Tables.documents(spark, sfDir))
    time("corpus count")(corpus.count())

    // ngram stages (md5 family)
    val normed = corpus.select(col("doc_id").as("id"),
      lower(regexp_replace(col("text"), "\\s+", " ")).as("norm"))
    val withGrams = normed.select(col("id"),
      NativeExpressions.charGramHashesMd5(spark, col("norm")).as("grams"))
    time("gram hashes (native md5)")(
      withGrams.select(sum(size(col("grams")))).collect())
    val sig = withGrams.select(col("id"),
        NativeExpressions.minHashSigs(spark, col("grams"), 16).as("sigs"))
      .select((col("id") +: (0 until 16).map(i =>
        element_at(col("sigs"), i + 1).as(s"mh_$i"))): _*)
    time("gram minhash sigs (native)")(sig.agg(count(col("mh_0"))).collect())
    val cand = Dedup.bandedCandidates(sig, 16, 4, Dedup.Md5Hash)
    val nCand = time("banded candidates")(cand.count())
    println(s"[profile] ngram candidate pairs: $nCand")
    time("full ngram pipeline (md5)")(
      Dedup.ngramJaccardNearDups(corpus, "doc_id", "text",
        hasher = Dedup.Md5Hash).count())

    time("full minhash pipeline (md5)")(
      Dedup.minhashNearDups(corpus, "doc_id", "text",
        hasher = Dedup.Md5Hash).count())

    // simhash stages (md5 family)
    val toks = corpus.select(col("doc_id").as("id"),
      graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
    val sh = toks.select(col("id"),
        NativeExpressions.tokenHashesMd5(spark, col("toks")).as("ths"))
      .select(col("id"), NativeExpressions.simhashFromHashes(spark, col("ths"), 60).as("sim"))
    // bit_xor as the forcing aggregate: sum() of 60-bit values overflows
    time("simhash values (native md5)")(sh.agg(bit_xor(col("sim"))).collect())
    val shCand = Dedup.simhashCandidates(sh, 60, 6)
    val nShPairs = time("simhash chunk candidates")(shCand.count())
    println(s"[profile] simhash pairs (hamming<=6): $nShPairs")
    time("full simhash pipeline (md5)")(
      Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = 6, bits = 60,
        hasher = Dedup.Md5Hash).count())
    spark.stop()
  }
}
