package graft

import graft.operators.{Similarity, Training}
import org.apache.spark.sql.functions._

/** Training-data assembly: sequence packing invariants and int8
  * quantization fidelity.
  */
class TrainingSpec extends SparkSpec {
  import spark.implicits._

  test("packing: every doc assigned once, packs respect the budget shape") {
    val docs = Tables.documents(spark, sfDir)
    val assigned = Training.packAssignments(docs, budget = 512, nShards = 8)
    assert(assigned.count() == docs.count())
    assert(assigned.select("doc_id").distinct().count() == docs.count())
    // concat-and-chunk: within a shard, tokens-before every pack's first
    // doc lands exactly in that pack => pack start offsets are multiples
    // of the budget; docs can straddle the cut, so a pack's token total
    // may exceed the budget only by its LAST doc's overhang
    val packs = Training.packSummary(docs, 512, 8)
    val overfull = packs.filter(col("n_docs") > 1 && col("total_tokens") >= 512 * 2)
    assert(overfull.count() == 0)
    // deterministic across partitionings
    val a = packs.collect().map(_.toSeq).toSet
    val b = Training.packSummary(docs.repartition(13), 512, 8)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("packing: single-doc corpus and giant doc degenerate safely") {
    val docs = Seq((0L, ("tok " * 2000).trim)).toDF("doc_id", "text")
    val p = Training.packSummary(docs, 512, 8).collect()
    assert(p.length == 1 && p.head.getAs[Long]("n_docs") == 1)
    assert(p.head.getAs[Long]("total_tokens") == 2000)
  }

  test("quantization: codes bounded, scale recovers values within 1/254") {
    val emb = Tables.embeddings(spark, sfDir)
    val qz = Training.quantizeEmbeddings(emb)
    val bad = qz.select(explode(col("codes")).as("c"))
      .filter(abs(col("c")) > 127).count()
    assert(bad == 0)
    // dequantization error per element <= scale/254 (half a code step);
    // uses the UNROUNDED scale the codes were actually built with
    val sc = Training.quantScale(col("embedding"))
    val err = Training
      .quantizeEmbeddings(emb).drop("scale")
      .join(emb, "vec_id")
      .withColumn("sc", sc)
      .select(col("sc"), explode(arrays_zip(col("embedding"), col("codes"))).as("z"))
      .select(col("sc"),
        abs(col("z.embedding").cast("double") -
          col("z.codes") * col("sc") / 127).as("e"))
      .filter(col("e") > col("sc") / 254 + 1e-9)
    assert(err.count() == 0)
  }

  test("quantized top-k keeps high recall vs float cosine top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(queries, emb, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val quant = Training.quantizedTopK(queries, emb, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall")
  }
}
