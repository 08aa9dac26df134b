package graft

import org.apache.spark.sql.functions._
import graft.functions.NativeExpressions
import graft.plans.ApproxDistinctRewrite

/** ApproxDistinctRewrite (custom Rule[LogicalPlan], the
  * SparkSessionExtensions deployment surface): hint/flag triggers, the
  * HLL++ accuracy contract, and graceful degradation without the rule.
  */
class PlansSpec extends SparkSpec {

  private def installRule(): Unit =
    if (!spark.experimental.extraOptimizations
          .exists(_.isInstanceOf[ApproxDistinctRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ApproxDistinctRewrite(spark)

  test("approx_hint is a pure identity expression") {
    val rows = Tables.orders(spark, sfDir).limit(20)
      .select(col("o_custkey"),
        NativeExpressions.approxHint(spark, col("o_custkey")).as("h"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.get(0) == r.get(1)))
  }

  test("hinted count(DISTINCT) rewrites to HLL++ and stays within 2%") {
    installRule()
    val o = Tables.orders(spark, sfDir)
    val exact = o.agg(countDistinct(col("o_custkey"))).head.getLong(0)
    val hinted = o.agg(countDistinct(
      NativeExpressions.approxHint(spark, col("o_custkey"))).as("d"))
    val plan = hinted.queryExecution.optimizedPlan.toString
    assert(plan.contains("approx_count_distinct"), plan)
    assert(!plan.contains("count(distinct"), plan)
    val got = hinted.head.getLong(0)
    assert(math.abs(got - exact) <= math.max(1.0, exact * 0.02),
      s"approx $got vs exact $exact")
  }

  test("un-hinted count(DISTINCT) stays exact with the rule installed") {
    installRule()
    val df = Tables.orders(spark, sfDir)
      .agg(countDistinct(col("o_custkey")).as("d"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("approx_count_distinct"), plan)
  }

  test("session flag rewrites every single-child count(DISTINCT)") {
    installRule()
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val df = Tables.orders(spark, sfDir)
        .agg(countDistinct(col("o_custkey")).as("d"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), plan)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }

  test("multi-child count(DISTINCT a, b) is left exact under the flag") {
    installRule()
    spark.conf.set("spark.graft.approxDistinct", "true")
    try {
      val df = Tables.orders(spark, sfDir)
        .agg(countDistinct(col("o_custkey"), col("o_orderstatus")).as("d"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("approx_count_distinct"), plan)
    } finally spark.conf.set("spark.graft.approxDistinct", "false")
  }
}
