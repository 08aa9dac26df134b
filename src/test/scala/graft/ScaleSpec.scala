package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Scale-pattern assertions: the plans behind SCALE.md's claims. */
class ScaleSpec extends SparkSpec {

  test("bucketed co-located join plan has no shuffle on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the bucket-join path (not a broadcast) is what
      // gets planned — the claim is exchange-free sort-merge via bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Sources.bucketedJoin(spark, sfDir)
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted aggregation equals plain aggregation") {
    val plain = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = graft.operators.Relational
      .queries("q_skew_salted_agg")(spark, sfDir).collect().toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("topk aggregator is partitioning-invariant (merge path)") {
    import org.apache.spark.sql.functions.udaf
    val top3 = udaf(new graft.functions.TopKAggregator(3))
    def run(parts: Int) = Tables.lineitem(spark, sfDir)
      .repartition(parts)
      .groupBy("l_returnflag").agg(top3(col("l_extendedprice")).as("tops"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1))).toMap
    val a = run(1); val b = run(13)
    assert(a == b && a.nonEmpty)
    a.values.foreach { tops =>
      assert(tops.size == 3 && tops == tops.sorted.reverse)
    }
  }

  test("star fact plan keeps every dimension join broadcast") {
    val plan = graft.operators.StarPipeline.fact(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the only sort-merge join permitted is the lineitem-orders fact join
    val smjCount = "SortMergeJoin".r.findAllIn(plan).size
    assert(smjCount <= 1, s"unexpected sort-merge joins ($smjCount):\n$plan")
  }
}
