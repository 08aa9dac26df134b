package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins beyond vanilla Spark (builder brief, custom-operator
  * preference (a): compose existing ops when semantics allow).
  *
  * As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` per key. Implemented as union + ordered
  * carry-forward window (`last(..., ignoreNulls)`) — ONE shuffle by key,
  * no range explosion, no per-row probe: the idiomatic distributed as-of.
  * At 100 TB this beats any broadcast/bucket range trick because state per
  * key is a single carried value and the sort is the shuffle's sort.
  *
  * Range join: measure-to-interval binding. The band side here is
  * dimension-sized, so the right plan is a broadcast join with the range
  * predicate evaluated at the probe (BroadcastNestedLoop over a handful of
  * rows — deliberately; a shuffle range join would only win when BOTH
  * sides are large, where the banding trick in Dedup applies instead).
  */
object TemporalJoins {

  /** As-of join via union + carry-forward.
    *
    * @param left     probe rows (keep all columns)
    * @param right    reference rows: (keyCol, tsCol, valueCol)
    * @param keyCol   equality key
    * @param tsCol    event-time column (both sides)
    * @param valueCol right-side value carried to each left row (null when
    *                 no right row precedes it)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__is_left", lit(1))
      .withColumn("__asof_val", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      col(keyCol), col(tsCol),
      lit(0).as("__is_left"), col(valueCol).as("__asof_val"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts (<= semantics); the
    // trailing value tie-break makes equal-ts right rows deterministic
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__is_left"), col("__asof_val"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__carried", last(col("__asof_val"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) :+ col("__carried").as(valueCol): _*)
  }

  /** Range join of a measure against interval bands: broadcast the bands,
    * bind with `lo <= x < hi`.
    */
  def rangeJoin(facts: DataFrame, bands: DataFrame, measure: String,
                lo: String, hi: String): DataFrame =
    facts.join(broadcast(bands),
      col(measure) >= col(lo) && col(measure) < col(hi), "left")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of: each purchase event picks up the latest preceding signup
    // value of the same user (the profile-enrichment shape).
    "q_asof_join" -> { (s, d) =>
      val evs = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          date_trunc("second", col("ts")).as("ts"),
          col("event_type"), col("value"))
      val purchases = evs.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val signups = evs.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value").as("signup_value"))
      asofJoin(purchases, signups, "user_id", "ts", "signup_value")
        .orderBy("event_id")
    },
    // Range: orders bound to price bands.
    "q_range_join" -> { (s, d) =>
      val bands = s.createDataFrame(Seq(
        (0.0, 50000.0, "low"), (50000.0, 150000.0, "mid"),
        (150000.0, 1e9, "high")))
        .toDF("lo", "hi", "band")
      rangeJoin(Tables.orders(s, d), bands, "o_totalprice", "lo", "hi")
        .groupBy("band")
        .agg(count(lit(1)).as("cnt"),
          Relational.sumDec(col("o_totalprice")).as("total"))
        .orderBy("band")
    }
  )

  def oracles: Map[String, String] = Map(
    // DuckDB has a native ASOF JOIN — an independent implementation of the
    // same semantics (ties: value-max among equal-ts right rows matches the
    // carry-forward's trailing tie-break).
    "q_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('second', ts) AS ts,
        |                  event_type, value FROM events),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
        |sg AS (SELECT user_id, ts, max(value) AS signup_value FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, p.ts, sg.signup_value
        |FROM p ASOF LEFT JOIN sg
        |  ON p.user_id = sg.user_id AND sg.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" ->
      """WITH bands(lo, hi, band) AS (
        | VALUES (0.0, 50000.0, 'low'), (50000.0, 150000.0, 'mid'),
        |        (150000.0, 1e9, 'high'))
        |SELECT band, count(*) AS cnt,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders LEFT JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
