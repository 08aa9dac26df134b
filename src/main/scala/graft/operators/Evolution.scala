package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-evolution operators: snapshot-to-snapshot change classification
  * (the CDC audit every incremental load needs before it trusts an append)
  * and cumulative distinct-entity reach over time (the "how fast is the
  * corpus/user base growing" curve). Extends the reference's idempotent
  * re-load posture (`dags/etl_crash_traffic.py:619-624` skips already-
  * loaded ids) with the diff report that says WHAT changed between loads.
  */
object Evolution {

  /** Classify every key across two snapshots of the orders table:
    * `added` (only in B), `removed` (only in A), `changed` (both, payload
    * differs), `unchanged`. Snapshots are carved deterministically from
    * the one table: A drops keys ≡ 0 (mod 13) [so they surface as added],
    * B drops keys ≡ 0 (mod 11) [removed] and bumps o_totalprice by 1.0 on
    * keys ≡ 0 (mod 7) [changed].
    *
    * Scale posture: ONE full-outer hash join on the key, then a
    * map-side-combined 4-group count — the minimal shape for a diff. At
    * 100 TB both snapshots would be bucketed by key on disk, making the
    * join exchange-free; payload compare is column-level (no row-hash
    * materialization, no concat of wide rows through the shuffle — only
    * the compared columns are read, so the parquet scan prunes the rest).
    */
  def tableDiff(orders: DataFrame): DataFrame = {
    val base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    val snapA = base.filter(col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus").as("status_a"),
        col("o_totalprice").as("price_a"))
    val snapB = base.filter(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus").as("status_b"),
        (when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice"))).as("price_b"))
    snapA.join(snapB, Seq("o_orderkey"), "full_outer")
      .select(
        when(col("status_a").isNull, "added")
          .when(col("status_b").isNull, "removed")
          .when(col("status_a") =!= col("status_b") ||
            col("price_a") =!= col("price_b"), "changed")
          .otherwise("unchanged").as("change_class"))
      .groupBy("change_class").agg(count(lit(1)).as("cnt"))
      .orderBy("change_class")
  }

  /** Per-day new and cumulative distinct users over the events stream:
    * first-seen date per user (one map-side-combined min-agg), then a
    * day-level count + running sum. The unpartitioned ORDER BY window
    * runs over the DAY-cardinality frame (a few thousand rows at any
    * corpus size), never over events — the standard spine trick this
    * repo uses for every cumulative (q_rolling_revenue, q_ewma_daily).
    */
  def cumulativeDistinctUsers(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("d"))
    val daily = firstSeen.groupBy("d").agg(count(lit(1)).as("new_users"))
    daily
      .withColumn("cum_users",
        sum(col("new_users")).over(
          Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("d")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_table_diff" -> { (s, d) => tableDiff(Tables.orders(s, d)) },
    "q_cumulative_distinct" -> { (s, d) =>
      cumulativeDistinctUsers(Tables.events(s, d)) }
  )

  def oracles: Map[String, String] = Map(
    "q_table_diff" ->
      """WITH a AS (
        | SELECT o_orderkey, o_orderstatus AS status_a,
        |  o_totalprice AS price_a
        | FROM orders WHERE o_orderkey % 13 <> 0),
        |b AS (
        | SELECT o_orderkey, o_orderstatus AS status_b,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
        |       ELSE o_totalprice END AS price_b
        | FROM orders WHERE o_orderkey % 11 <> 0)
        |SELECT CASE
        |  WHEN status_a IS NULL THEN 'added'
        |  WHEN status_b IS NULL THEN 'removed'
        |  WHEN status_a <> status_b OR price_a <> price_b THEN 'changed'
        |  ELSE 'unchanged' END AS change_class,
        | count(*) AS cnt
        |FROM a FULL OUTER JOIN b USING (o_orderkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_cumulative_distinct" ->
      """WITH fs AS (
        | SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY 1),
        |daily AS (SELECT d, count(*) AS new_users FROM fs GROUP BY 1)
        |SELECT d, new_users,
        | CAST(sum(new_users) OVER (ORDER BY d
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS cum_users
        |FROM daily ORDER BY d""".stripMargin
  )
}
