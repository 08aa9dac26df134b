package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based approximate analytics — the 100 TB substitutes for exact
  * one-liners that stop being runnable at scale:
  *
  *  - COUNT(DISTINCT x) keeps a per-group hash set → executor OOM on a
  *    high-cardinality column; HyperLogLog++ (`approx_count_distinct`)
  *    keeps a fixed few-KB register array, merges associatively, and is
  *    deterministic for a given dataset (hash-based, order-independent).
  *  - exact `percentile` buffers every value (the same OOM — the reason
  *    Analytics.exactPercentiles exists); `percentile_approx` keeps a
  *    bounded Greenwald-Khanna summary with a rank-error guarantee.
  *
  * Oracle shape: a static DuckDB query cannot reproduce Spark's sketch
  * internals, so each query emits the EXACT statistic (hash-compared as
  * usual) alongside a within-tolerance BOOLEAN the oracle pins to TRUE —
  * the sketch's error contract is what's being gated, at every sf the
  * driver runs. The exact twin inside the query doubles as the
  * cross-check that the sketch saw the same data.
  */
object Sketches {

  /** HLL++ distinct-count vs exact, with the 2% contract (rsd = 0.01).
    * The exact side uses count(DISTINCT) — fine at test scale and it is
    * precisely the thing the sketch replaces in production.
    */
  def approxDistinct(df: DataFrame, c: String, tol: Double): DataFrame =
    df.agg(
        countDistinct(col(c)).as("exact_distinct"),
        approx_count_distinct(col(c), 0.01).as("__approx"))
      .select(col("exact_distinct"),
        (abs(col("__approx") - col("exact_distinct")) <=
          col("exact_distinct").cast("double") * tol).as("within_tol"))

  /** GK-sketch median vs the distributed exact percentile (accuracy
    * 10000 → rank error ≤ n/10000), with a 1% value-tolerance contract.
    */
  def approxMedian(df: DataFrame, c: String, tol: Double): DataFrame = {
    val approx = df.agg(
      percentile_approx(col(c).cast("double"), lit(0.5), lit(10000)).as("__approx"))
    Analytics.exactPercentiles(df, c, Seq("exact_p50" -> 0.5))
      .crossJoin(broadcast(approx))
      .select(col("exact_p50"),
        (abs(col("__approx") - col("exact_p50")) <=
          abs(col("exact_p50")) * tol).as("within_tol"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_distinct" -> { (s, d) =>
      approxDistinct(Tables.orders(s, d), "o_custkey", 0.02)
    },
    "q_approx_median" -> { (s, d) =>
      approxMedian(Tables.lineitem(s, d), "l_extendedprice", 0.01)
    }
  )

  def oracles: Map[String, String] = Map(
    "q_approx_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS exact_distinct,
        | TRUE AS within_tol
        |FROM orders""".stripMargin,
    "q_approx_median" ->
      """SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS exact_p50,
        | TRUE AS within_tol
        |FROM lineitem""".stripMargin
  )
}
