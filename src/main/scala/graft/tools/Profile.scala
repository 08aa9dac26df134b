package graft.tools

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler: stage-by-stage timings of the near-dup pipelines. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
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

    val norm = lower(regexp_replace(col("text"), "\\s+", " "))
    val grams = array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - 3, lit(1))),
      i => norm.substr(i, lit(4))))
    time("grams only")(corpus.select(col("doc_id"), grams.as("g"))
      .select(sum(size(col("g")))).collect())

    val keyed = corpus.select(col("doc_id").as("id"), substring(norm, 1, 16).as("bucket"))
    time("bucket self-join ids")(
      keyed.select(col("bucket"), col("id").as("id_a"))
        .join(keyed.select(col("bucket"), col("id").as("id_b")), Seq("bucket"))
        .filter(col("id_a") < col("id_b")).count())

    time("full ngram pipeline")(
      Dedup.ngramJaccardNearDups(corpus, "doc_id", "text").count())

    val sh = corpus
      .select(col("doc_id").as("id"), graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("id"), Dedup.shingles(col("toks")).as("sh"))
    time("shingles only")(sh.select(sum(size(col("sh")))).collect())
    time("minhash sigs")(
      sh.select(col("id"), transform(col("sh"), x => xxhash64(x)).as("hs"))
        .select((col("id") +: Dedup.minhashSignatures(col("hs"), 16)): _*)
        .agg(count(col("mh_0"))).collect())
    time("full minhash pipeline")(
      Dedup.minhashNearDups(corpus, "doc_id", "text").count())

    time("simhash only")(
      corpus.select(Dedup.simhash(col("text")).as("s")).agg(sum(col("s"))).collect())
    time("full simhash pipeline")(
      Dedup.simhashNearDups(corpus, "doc_id", "text", maxHamming = 6).count())
    spark.stop()
  }
}
