package graft

import graft.operators.{Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Degenerate-input robustness: empty/whitespace/unicode/single-token text
  * through every text and dedup function — no exceptions, outputs in their
  * documented ranges. (The 100 TB posture: a handful of pathological rows
  * must never kill a stage.)
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val weird = Seq(
    "", "   ", "\t\n ", "a", "one two",
    "über café 北京 emoji mix", "repeat repeat repeat repeat",
    "x" * 5000)

  test("exact percentiles survive degenerate inputs") {
    import graft.operators.Analytics
    // single value: every percentile IS that value
    val one = Seq(7.5).toDF("v")
    val r1 = Analytics.exactPercentiles(one, "v",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)).collect()(0)
    assert((0 until 3).forall(i => r1.getDouble(i) == 7.5))
    // all-null column: no crash, null percentiles (pandas describe shape)
    val nulls = Seq[Option[Double]](None, None).toDF("v")
    val r2 = Analytics.exactPercentiles(nulls, "v", Seq("p50" -> 0.5)).collect()(0)
    assert(r2.isNullAt(0))
    // two values: interpolation between distinct order statistics
    val two = Seq(1.0, 3.0).toDF("v")
    val r3 = Analytics.exactPercentiles(two, "v", Seq("p50" -> 0.5)).collect()(0)
    assert(r3.getDouble(0) == 2.0)
    // grouped: a group with one value and a group with two, one pass
    val g = Seq(("a", 5.0), ("b", 1.0), ("b", 3.0)).toDF("g", "v")
    val rg = Analytics.groupedExactPercentiles(g, "g", "v", Seq("p50" -> 0.5))
      .orderBy("g").collect()
    assert(rg(0).getDouble(1) == 5.0 && rg(1).getDouble(1) == 2.0)
  }

  test("text functions survive degenerate inputs with sane ranges") {
    val df = weird.toDF("text").select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.bpeTokenCount(col("text")).as("nb"),
      TextAnalysis.stopwordRatio(col("text")).as("sr"),
      TextAnalysis.punctRatio(col("text")).as("pr"),
      TextAnalysis.meanTokenLen(col("text")).as("mtl"),
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    df.collect().foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(1) >= 0)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getString(6).nonEmpty && r.getString(7).length == 32)
    }
    // empty and whitespace-only docs tokenize to zero
    val counts = weird.toDF("text")
      .select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(counts(0) == 0 && counts(1) == 0 && counts(2) == 0)
  }

  test("dedup primitives survive degenerate inputs") {
    val toks = weird.toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("toks"))
    val sh = toks.select(
      Dedup.shingles(col("toks")).as("sh"),
      graft.functions.NativeExpressions.shingleHashes(spark, col("toks")).as("hs"),
      graft.functions.NativeExpressions.simhashNative(spark, col("toks")).as("sim"))
    sh.collect().foreach { r =>
      assert(r.getSeq[String](0).nonEmpty) // short-doc guard yields 1 shingle
      assert(r.getSeq[Long](1).nonEmpty)
      // empty token array -> simhash 0 (no votes)
    }
    val grams = weird.toDF("text").select(
      graft.functions.NativeExpressions.charGramHashes(
        spark, lower(regexp_replace(col("text"), "\\s+", " "))).as("g"))
    grams.collect().foreach(r => assert(r.getSeq[Long](0).nonEmpty))
  }

  test("fake decoder handles empty payload") {
    assert(Multimodal.FakeDecoder.decode(Array.emptyByteArray) == (-1, -1))
    assert(Multimodal.FakeDecoder.decode(Array[Byte](65)) == (65, 65))
  }

  test("describeAll: pandas describe(include=all) semantics on nulls") {
    val df = Seq(
      (Option(1.0), Option("a")),
      (Option(3.0), Option("b")),
      (None: Option[Double], Option("b")),
      (Option(5.0), None: Option[String])
    ).toDF("x", "cat")
    val rows = graft.operators.Analytics.describeAll(df, Seq("x"), Seq("cat"))
      .collect().map(r => r.getString(0) -> r).toMap
    val x = rows("x")
    assert(x.getLong(1) == 3)                       // cnt excludes null
    assert(math.abs(x.getDouble(2) - 3.0) < 1e-12)  // mean
    assert(math.abs(x.getDouble(3) - 2.0) < 1e-12)  // sample std of 1,3,5
    val c = rows("cat")
    assert(c.getLong(1) == 3)                       // non-null count
    assert(c.getLong(6) == 2)                       // n_unique excludes null
    assert(c.getString(7) == "b" && c.getLong(8) == 2) // top/freq exclude null
  }

  test("BPE training survives degenerate corpora") {
    // empty corpus / no pairs anywhere: empty merge table, no crash
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(spark, empty, 3).count() == 0)
    val singles = Seq((1L, "one"), (2L, ""), (3L, "  \t "), (4L, "日本語"))
      .toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(spark, singles, 3).count() == 0)
    // exactly one pair: one merge, then exhaustion stops the loop early
    val onePair = Seq((1L, "a b")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(spark, onePair, 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(m == Seq((1L, "a", "b", 1L)))
  }

  test("fuzzy match handles short names and empty blocks") {
    val rows = Seq((1L, "ab"), (2L, "ab"), (3L, "xy")).toDF("p_partkey", "p_name")
    val dir = java.nio.file.Files.createTempDirectory("fuzzy_edge").toString
    rows.write.mode("overwrite").parquet(s"$dir/part.parquet")
    // distinct-name level: "ab" dedupes to one name; no pair survives
    assert(Dedup.queries("q_fuzzy_match")(spark, dir).count() == 0)
  }

  test("media resize on degenerate payloads: empty filtered, 1-byte kept whole") {
    val docs = Seq((1L, ""), (2L, "x"), (3L, "abcdefgh")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("resize_edge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.queries("q_mm_resize")(spark, dir)
      .select("media_id", "orig_bytes", "resized_bytes")
      .as[(Long, Long, Long)].collect().toSet
    // stride 4: 1 byte → 1, 8 bytes → bytes 0 and 4 → 2; empty dropped
    assert(got == Set((2L, 1L, 1L), (3L, 8L, 2L)))
  }

  test("FAILFAST scan throws on the rows PERMISSIVE quarantines") {
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("failfast").toFile
    val w = new java.io.FileWriter(new java.io.File(dir, "data.csv"))
    w.write("k,v\n1,1.5\nnot_a_number,broken\n"); w.close()
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", DoubleType)))
    val strict = spark.read.schema(schema).option("header", true)
      .option("mode", "FAILFAST").csv(dir.toString)
    intercept[org.apache.spark.SparkException](strict.collect())
    // same file, PERMISSIVE + corrupt column: good row kept, bad quarantined
    val lax = spark.read
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("header", true).option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record").csv(dir.toString)
    val n = lax.agg(count(col("k")), count(col("_corrupt_record"))).head()
    assert(n.getLong(0) == 1 && n.getLong(1) == 1)
  }

  test("gap fill emits a dense spine over single-day and sparse inputs") {
    import java.sql.Timestamp
    val orders = Seq(
      (1L, Timestamp.valueOf("2020-01-01 10:00:00")),
      (2L, Timestamp.valueOf("2020-01-04 09:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val dir = java.nio.file.Files.createTempDirectory("gap_edge").toString
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.SqlSurface.queries("q_gap_fill")(spark, dir)
      .as[(java.sql.Date, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 0L, 0L, 1L)) // 4 dense days, gaps zeroed
  }
}
