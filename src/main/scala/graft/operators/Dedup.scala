package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication for a training-data pipeline (builder brief): exact,
  * MinHash+LSH near-dup, SimHash, and n-gram Jaccard — every candidate
  * generation is BUCKETED (band-hash equi-joins), never an all-pairs cross
  * join: at 100 TB the shuffle key is the band hash, candidate pairs are
  * only generated within buckets, and the expensive exact-Jaccard verify
  * runs on that tiny candidate set (VERDICT.md round-1 design requirement).
  *
  * All hashes are Spark-builtin xxhash64/md5 expressions — codegen'd, no
  * UDFs. Signatures are computed map-side in one pass over the tokens
  * array via higher-order functions.
  */
object Dedup {

  /** Exact dedup: canonical survivor (min id) per normalized-text
    * fingerprint. One hash-shuffle on the fingerprint; with the map-side
    * partial agg the shuffle carries one row per distinct doc per task.
    */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles of the document (distinct). */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(textCol)
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** One MinHash signature per seed: min over shingles of a seeded 64-bit
    * hash (xxhash64 of seed-prefixed shingle).
    */
  def minhashSignatures(shinglesCol: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { seed =>
      array_min(transform(shinglesCol, sh => xxhash64(lit(s"mh$seed:"), sh)))
        .as(s"mh_$seed")
    }

  /** LSH band keys: the `numHashes` signatures grouped into bands of
    * `rowsPerBand`, each band hashed to one bucket key. Docs sharing any
    * band key become candidates.
    */
  def bandKeys(numHashes: Int, rowsPerBand: Int): Seq[Column] = {
    val bands = numHashes / rowsPerBand
    (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      xxhash64((lit(b.toString) +: cols): _*).as(s"band_$b")
    }
  }

  /** Exact Jaccard of two shingle arrays (the verify step on candidates). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** MinHash+LSH near-duplicate pairs with verified Jaccard ≥ threshold.
    *
    * Pipeline: tokens → shingles → minhash sigs → band keys → explode bands
    * → self equi-join on (band, key) with id< id (no cross join) →
    * distinct candidate pairs → exact-Jaccard verify → filter.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 16, rowsPerBand: Int = 2,
                      threshold: Double = 0.5): DataFrame = {
    val withShingles = docs
      .select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
    val sig = withShingles
      .select((col("id") +: col("sh") +: minhashSignatures(col("sh"), numHashes)): _*)
    val bands = numHashes / rowsPerBand
    val banded = sig
      .select(col("id"), col("sh"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"), bandKeys(numHashes, rowsPerBand)(b).as("key"))
        }: _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("key"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")
    candidates
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash (32-bit here): per-bit majority vote over token hashes,
    * computed as 32 higher-order aggregates over the tokens array —
    * map-side only, no shuffle.
    */
  def simhash(textCol: Column, bits: Int = 32): Column = {
    val toks = TextAnalysis.tokens(textCol)
    val bitCols = (0 until bits).map { b =>
      val vote = aggregate(toks, lit(0L),
        (acc, t) => acc + (shiftright(xxhash64(t), b).bitwiseAND(1L)) * 2 - 1)
      when(vote > 0, lit(1L << b)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhashes via bit_count(xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates, bucketed by the two 16-bit halves
    * (pigeonhole: any pair within Hamming distance d collides on at least
    * one of d+1 disjoint chunks; 2 halves cover d≤1 exactly and act as the
    * LSH recall/precision trade for larger d).
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sim"))
    val banded = sh.select(col("id"), col("sim"),
      explode(array(
        struct(lit(0).as("band"), (col("sim").bitwiseAND(0xFFFFL)).as("key")),
        struct(lit(1).as("band"), shiftright(col("sim"), 16).bitwiseAND(0xFFFFL).as("key"))
      )).as("bk"))
      .select(col("id"), col("sim"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"), col("id").as("id_a"), col("sim").as("sim_a"))
    val r = banded.select(col("band"), col("key"), col("id").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sim_a"), col("sim_b")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Character n-gram Jaccard near-dup, candidates bucketed by a cheap
    * prefix key (first 16 normalized chars) — the "same opening" heuristic
    * keeps candidate sets tiny without all-pairs.
    */
  def ngramJaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                           n: Int = 4, threshold: Double = 0.7): DataFrame = {
    val norm = lower(regexp_replace(col(textCol), "\\s+", " "))
    // character n-grams: substr over an index sequence, deduped
    val gramsReal = array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
      i => norm.substr(i, lit(n))))
    val base = docs.select(col(idCol).as("id"),
      substring(norm, 1, 16).as("bucket"), gramsReal.as("grams"))
    val l = base.select(col("bucket"), col("id").as("id_a"), col("grams").as("g_a"))
    val r = base.select(col("bucket"), col("id").as("id_b"), col("grams").as("g_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("g_a"), col("g_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Deterministic near-dup corpus: the documents table plus mutated copies
    * of the first `nPlanted` docs (id + 10^7, one token appended) — lets the
    * near-dup queries prove recall on data that contains no natural dups.
    */
  def plantedCorpus(docs: DataFrame, nPlanted: Int = 20): DataFrame = {
    val planted = docs.filter(col("doc_id") < nPlanted)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" appended")).as("text"))
    docs.select("doc_id", "text").unionByName(planted)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup over a corpus with planted exact copies (documents ∪
    // first-20 verbatim) — groups of 2 for planted ids, 1 otherwise.
    "q_dedup_exact" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val copies = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      val corpus = docs.select("doc_id", "text").unionByName(copies)
      exactDedup(corpus).orderBy("keep_id")
    },
    // MinHash+LSH near-dups on the planted corpus: must recover all 20
    // planted pairs (high-Jaccard mutations) — rows-only driver check plus
    // the ScalaTest recall assertion.
    "q_dedup_minhash" -> { (s, d) =>
      minhashNearDups(plantedCorpus(Tables.documents(s, d)), "doc_id", "text")
        .orderBy("id_a", "id_b")
    },
    "q_dedup_simhash" -> { (s, d) =>
      simhashNearDups(plantedCorpus(Tables.documents(s, d)), "doc_id", "text", maxHamming = 6)
        .orderBy("id_a", "id_b")
    },
    "q_dedup_ngram" -> { (s, d) =>
      ngramJaccardNearDups(plantedCorpus(Tables.documents(s, d)), "doc_id", "text")
        .orderBy("id_a", "id_b")
    }
  )

  /** Only exact dedup is DuckDB-expressible 1:1; the near-dup pipelines
    * hinge on Spark's xxhash64 (no DuckDB equivalent) → rows-only checks.
    */
  def oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """WITH corpus AS (
        | SELECT doc_id, text FROM documents
        | UNION ALL
        | SELECT doc_id + 10000000, text FROM documents WHERE doc_id < 20)
        |SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM corpus GROUP BY 1 ORDER BY keep_id""".stripMargin
  )
}
