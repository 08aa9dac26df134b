package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's centerpiece re-expressed Spark-first: star-schema build
  * ("star schema design, optimized for analytical queries",
  * pdf/Traffic_Accidents_ETL_Documentation.pdf §5.4).
  *
  * Reference shape (dags/etl_crash_traffic.py:666-905): scan the flat fact
  * table, extract each dimension's distinct natural keys, assign surrogate
  * ids, then resolve every fact row's FKs via dict probes. Here: dims =
  * `distinct` + deterministic `row_number` surrogate (Star.buildDim), FK
  * resolution = successive broadcast hash LEFT joins (Star.resolveDims).
  *
  * Scale: the flat fact is lineitem ⋈ orders on l_orderkey — both sides
  * large, so that one join shuffles on the join key (sort-merge, AQE-
  * coalesced); on a real deployment both tables would be bucketed by
  * orderkey to make it shuffle-free. Every dimension join is a broadcast:
  * the fact table is never shuffled again after the orderkey join.
  */
object StarPipeline {

  /** The flat pre-star fact row (the reference's `accidentes_final`). */
  def flatFact(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_orderdate", "o_orderstatus", "o_orderpriority")
    li.join(o, col("l_orderkey") === col("o_orderkey"), "inner")
      .withColumn("y", year(col("o_orderdate")))
      .withColumn("m", month(col("o_orderdate")))
      .withColumn("dom", dayofmonth(col("o_orderdate")))
      .withColumn("dayname", date_format(col("o_orderdate"), "EEEE"))
  }

  /** Dimension specs: name → natural-key columns (the reference's 8 dims,
    * dags/etl_crash_traffic.py:50-118, mapped onto the test schema).
    */
  val dimSpecs: Seq[(String, Seq[String])] = Seq(
    "dim_date"     -> Seq("y", "m", "dom", "dayname"),          // dim_fecha
    "dim_status"   -> Seq("o_orderstatus"),                      // dim_clima
    "dim_priority" -> Seq("o_orderpriority"),                    // dim_iluminacion
    "dim_flags"    -> Seq("l_returnflag", "l_linestatus")        // dim_condicion_camino
  )

  def dims(s: SparkSession, d: String): Map[String, DataFrame] = {
    val f = flatFact(s, d)
    dimSpecs.map { case (name, key) =>
      name -> Star.buildDim(f, key, name + "_id")
    }.toMap
  }

  /** The star fact: every natural key replaced by its surrogate id via
    * broadcast left joins (J2), measures kept.
    */
  def fact(s: SparkSession, d: String): DataFrame = {
    val f = flatFact(s, d)
    val dm = dims(s, d)
    val resolved = Star.resolveDims(f, dimSpecs.map { case (n, k) => (dm(n), k) })
    resolved.select(
      col("l_orderkey"), col("l_linenumber"),
      col("dim_date_id"), col("dim_status_id"), col("dim_priority_id"),
      col("dim_flags_id"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The flagship: full star build, FK-resolved fact rows.
    "q_star_fact" -> { (s, d) =>
      fact(s, d).orderBy("l_orderkey", "l_linenumber")
    },
    // Per-dim contract: distinct natural keys + deterministic surrogates.
    "q_star_dim_date" -> { (s, d) =>
      dims(s, d)("dim_date").orderBy("dim_date_id")
    },
    "q_star_dim_flags" -> { (s, d) =>
      dims(s, d)("dim_flags").orderBy("dim_flags_id")
    }
  )

  private val dimDateSql =
    """SELECT y, m, dom, dayname,
      | CAST(row_number() OVER (ORDER BY y, m, dom, dayname) AS BIGINT) AS dim_date_id
      |FROM (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS y,
      |       CAST(month(o_orderdate) AS INTEGER) AS m,
      |       CAST(day(o_orderdate) AS INTEGER) AS dom,
      |       dayname(o_orderdate) AS dayname
      |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q_star_fact" ->
      s"""WITH f AS (
         | SELECT l.*, o.o_orderdate, o.o_orderstatus, o.o_orderpriority,
         |  year(o_orderdate) AS y, month(o_orderdate) AS m,
         |  day(o_orderdate) AS dom, dayname(o_orderdate) AS dayname
         | FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |dim_date AS ($dimDateSql),
         |dim_status AS (
         | SELECT o_orderstatus,
         |  CAST(row_number() OVER (ORDER BY o_orderstatus) AS BIGINT) AS dim_status_id
         | FROM (SELECT DISTINCT o_orderstatus FROM f)),
         |dim_priority AS (
         | SELECT o_orderpriority,
         |  CAST(row_number() OVER (ORDER BY o_orderpriority) AS BIGINT) AS dim_priority_id
         | FROM (SELECT DISTINCT o_orderpriority FROM f)),
         |dim_flags AS (
         | SELECT l_returnflag, l_linestatus,
         |  CAST(row_number() OVER (ORDER BY l_returnflag, l_linestatus) AS BIGINT) AS dim_flags_id
         | FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM f))
         |SELECT f.l_orderkey, f.l_linenumber, dim_date_id, dim_status_id,
         | dim_priority_id, dim_flags_id, l_quantity, l_extendedprice, l_discount
         |FROM f
         |LEFT JOIN dim_date USING (y, m, dom, dayname)
         |LEFT JOIN dim_status USING (o_orderstatus)
         |LEFT JOIN dim_priority USING (o_orderpriority)
         |LEFT JOIN dim_flags USING (l_returnflag, l_linestatus)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_star_dim_date" -> (dimDateSql + "\nORDER BY dim_date_id"),
    "q_star_dim_flags" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(row_number() OVER (ORDER BY l_returnflag, l_linestatus) AS BIGINT) AS dim_flags_id
        |FROM (SELECT DISTINCT l_returnflag, l_linestatus
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |ORDER BY dim_flags_id""".stripMargin
  )
}
