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
  * All hashes are Spark-builtin xxhash64/md5 expressions — no UDFs.
  *
  * Performance note (measured, not guessed): expression trees referenced
  * inside higher-order-function lambdas are re-evaluated PER ARRAY ELEMENT
  * — an inlined `split(...)` inside a shingling transform turns into
  * millions of tokenizations. Every pipeline below therefore materializes
  * its intermediate array (tokens / normalized text / hash array) as a
  * projected column first, so lambdas only read attributes. Signatures
  * hash each shingle once to a long, then derive the k minhashes by
  * hashing the long (cheap) rather than re-hashing the string k times.
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

  /** Word n-gram shingles over a MATERIALIZED tokens column (distinct). */
  def shingles(toks: Column, n: Int = 3): Column = {
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** id + shingle-hash array via the native single-pass expression
    * (bit-equal to `transform(shingles(toks), xxhash64)` — asserted in
    * tests — without materializing shingle strings).
    */
  private def withShingleHashes(docs: DataFrame, idCol: String,
                                textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        graft.functions.NativeExpressions.shingleHashes(docs.sparkSession, col("toks")).as("hs"))

  /** One MinHash signature per seed over the materialized long-hash array:
    * min over xxhash64(seed, h) — a 64-bit universal-hash family without
    * per-seed string hashing.
    */
  def minhashSignatures(hashArr: Column, numHashes: Int): Seq[Column] =
    (0 until numHashes).map { seed =>
      array_min(transform(hashArr, h => xxhash64(lit(seed), h))).as(s"mh_$seed")
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
    * Pipeline: tokens → shingles → shingle hashes → minhash sigs → band
    * keys → explode bands → self equi-join on (band, key) with id<id (no
    * cross join) → distinct id pairs → re-attach shingles → exact-Jaccard
    * verify. Candidate pairs carry IDS ONLY through the band join +
    * distinct — shuffling shingle arrays through every band would multiply
    * exchange volume by the band count.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 16, rowsPerBand: Int = 2,
                      threshold: Double = 0.5): DataFrame = {
    val base = withShingleHashes(docs, idCol, textCol)
    val sig = base
      .select((col("id") +: minhashSignatures(col("hs"), numHashes)): _*)
    val bands = numHashes / rowsPerBand
    val banded = sig
      .select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"), bandKeys(numHashes, rowsPerBand)(b).as("key"))
        }: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("key"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    // exact-Jaccard verify over the HASH arrays (64-bit collisions are
    // negligible and longs shuffle/intersect far cheaper than strings)
    val shA = base.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val shB = base.select(col("id").as("id_b"), col("hs").as("hs_b"))
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("hs_a"), col("hs_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash bits from a MATERIALIZED token-hash array: per-bit majority
    * vote, one aggregate per bit over attribute reads only.
    */
  def simhashFromHashes(hashes: Column, bits: Int = 32): Column = {
    val bitCols = (0 until bits).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1L)) * 2 - 1)
      when(vote > 0, lit(1L << b)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** Convenience single-expression simhash (tests / small inputs). */
  def simhash(textCol: Column, bits: Int = 32): Column =
    simhashFromHashes(transform(TextAnalysis.tokens(textCol), t => xxhash64(t)), bits)

  /** id + simhash via the native single-pass expression (pipeline path;
    * bit-identical to the HOF formulation — asserted in tests).
    */
  def withSimhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        graft.functions.NativeExpressions.simhashNative(docs.sparkSession, col("toks")).as("sim"))

  /** Hamming distance between two simhashes via bit_count(xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates, bucketed by the two 16-bit halves
    * (pigeonhole: any pair within Hamming distance d collides on at least
    * one of d+1 disjoint chunks; 2 halves cover d≤1 exactly and act as the
    * LSH recall/precision trade for larger d).
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val sh = withSimhash(docs, idCol, textCol)
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
    // normalized text materialized FIRST (a lambda-inlined regexp_replace
    // would re-run per gram); gram hashing runs in the native single-pass
    // expression (bit-equal to xxhash64 over the substr HOF grams —
    // asserted in tests), so longs flow through the verify
    val normed = docs.select(col(idCol).as("id"),
      lower(regexp_replace(col(textCol), "\\s+", " ")).as("norm"))
    val withGrams = normed.select(col("id"), substring(col("norm"), 1, 16).as("bucket"),
      graft.functions.NativeExpressions.charGramHashes(docs.sparkSession, col("norm")).as("grams"))
    val keyed = withGrams.select("id", "bucket")
    val l = keyed.select(col("bucket"), col("id").as("id_a"))
    val r = keyed.select(col("bucket"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    candidates
      .join(withGrams.select(col("id").as("id_a"), col("grams").as("g_a")), Seq("id_a"))
      .join(withGrams.select(col("id").as("id_b"), col("grams").as("g_b")), Seq("id_b"))
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
