package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources & sinks (SURVEY.md §2.1). Parquet scan (S3) is exercised by every
  * query; here: CSV scan/sink (S1/S2) with explicit schema + timestamp
  * format, proven by a value-fidelity round-trip, and schema declarations
  * (S5). Kafka-shaped streaming sources/sinks (S8/S9) live in
  * graft.streaming.
  */
object Sources {

  /** S5 — explicit StructType contract for the CSV round-trip (the
    * reference's DDL-declared schemas; dags/etl_crash_traffic.py:50-147).
    */
  val ordersCsvSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType)))

  /** S1 + S2 — header CSV sink then schema-ed CSV scan with an explicit
    * timestamp format (the reference's `%m/%d/%Y %I:%M:%S %p` parse,
    * notebooks/001_extract.ipynb cell 11 — pattern differs, machinery
    * identical). Scratch lives under target/ (gitignored).
    */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = "/root/repo/target/scratch/csv_orders"
    Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite")
      .option("header", true)
      .csv(tmp)
    s.read.schema(ordersCsvSchema)
      .option("header", true)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS")
      .csv(tmp)
      .orderBy("o_orderkey")
  }

  /** S4 — the idempotent-append sink driven end-to-end: partial first
    * load, two idempotent loads of the full table (second is a no-op),
    * then read back — the table must hold each key exactly once (the
    * reference's `ON CONFLICT (id) DO NOTHING` contract,
    * dags/etl_crash_traffic.py:641-654).
    */
  def idempotentWriteRoundtrip(s: SparkSession, d: String): DataFrame = {
    val path = "/root/repo/target/scratch/idempotent_orders"
    val dir = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (dir.exists()) rm(dir)
    val orders = Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
    orders.filter(col("o_orderkey") % 2 === 0).write.parquet(path)
    graft.operators.Star.idempotentWrite(orders, path, Seq("o_orderkey"))
    graft.operators.Star.idempotentWrite(orders, path, Seq("o_orderkey")) // no-op
    s.read.parquet(path).orderBy("o_orderkey")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_s1_csv_roundtrip" -> csvRoundtrip _,
    "q_s4_idempotent_write" -> idempotentWriteRoundtrip _
  )

  def oracles: Map[String, String] = Map(
    "q_s1_csv_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_s4_idempotent_write" ->
      """SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
