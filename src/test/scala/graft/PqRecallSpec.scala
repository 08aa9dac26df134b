package graft
import org.apache.spark.sql.functions._
/** PQ/ADC quality gate: the rescored shortlist must recover most of the
  * exact top-10 while ADC codes alone are only a coarse filter.
  */
class PqRecallSpec extends SparkSpec {
  test("pq adc recall vs exact integer L2 top-10") {
    val emb = Tables.embeddings(spark, sfDir)
    val pq = graft.operators.Similarity.pqTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    def quant(c: org.apache.spark.sql.Column) =
      transform(c, x => floor(x.cast("double") * 1048576).cast("long"))
    val base = emb.filter(size(col("embedding")) === 64)
      .select(col("vec_id"), quant(col("embedding")).as("qv"))
    val qs = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("qv").as("qe"))
    val exact = base.filter(col("vec_id") >= 5).crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"),
        aggregate(zip_with(col("qe"), col("qv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy("d", "vec_id")))
      .filter(col("rn") <= 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = exact.keys.toSeq.sorted.map { q =>
      (pq(q) & exact(q)).size / 10.0
    }
    // measured on this corpus: ADC-only ~0.28, rescored-shortlist 0.70 —
    // gate well below the measurement but far above the ADC-only level,
    // so a rescore regression (or a codebook-replay break) fails loudly
    assert(recalls.sum / recalls.size >= 0.55,
      s"mean recall ${recalls.sum / recalls.size} (${recalls.mkString(",")})")
    recalls.foreach(r => assert(r >= 0.4, recalls.mkString(",")))
  }
}
