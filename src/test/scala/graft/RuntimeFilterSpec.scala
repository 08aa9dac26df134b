package graft

import org.apache.spark.sql.functions._

/** Catalyst runtime row-level filtering on the engine's own join shape —
  * the 100 TB story: when a dimension carries a selective predicate, Spark
  * can inject a bloom filter built from the dimension's join keys into the
  * FACT scan, so rows that cannot survive the join are dropped before the
  * shuffle (InjectRuntimeFilter). On a 1000-executor SMJ this is the
  * difference between shuffling the whole fact table and shuffling the
  * matching fraction. The engine leans on this (SCALE.md §joins) — so pin
  * that the optimizer actually fires on our star-join shape, and that the
  * flag controls it (a Spark upgrade that changes either surfaces here,
  * not in production).
  */
class RuntimeFilterSpec extends SparkSpec {

  private def starJoin(s: org.apache.spark.sql.SparkSession) = {
    val o = s.read.parquet(s"$sfDir/orders.parquet")
    val c = s.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
  }

  test("selective dim filter injects a bloom filter into the fact scan") {
    val s2 = SparkSpec.session.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // local[4] parquet is far below the 10 GiB default application-side
    // gate; drop it so the local plan exercises the same rule a real
    // fact-scale plan hits with default thresholds
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    val plan = starJoin(s2).queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(plan.contains("bloom_filter_agg"), plan.take(2000))
    // the filter lands on the FACT side key (o_custkey), pre-shuffle
    assert(plan.contains("might_contain") && plan.contains("o_custkey"),
      plan.take(2000))
  }

  test("negative control: with the rule disabled, no bloom filter appears") {
    val s2 = SparkSpec.session.newSession()
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = starJoin(s2).queryExecution.optimizedPlan.toString
    assert(!plan.contains("might_contain"), plan.take(2000))
  }
}
