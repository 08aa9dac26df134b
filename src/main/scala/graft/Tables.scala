package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Table roles mirror the reference's domain (FIXTURES.md §2):
  * `lineitem`/`orders` play the accident fact rows, `customer`/`supplier`/
  * `part`/`nation`/`region` the dimensions, `events` the Kafka-fed stream,
  * `documents`/`embeddings` the LLM-pipeline extensions.
  *
  * Scale posture: plain parquet scans — Catalyst's V2ScanRelationPushDown
  * prunes columns and pushes predicates into the scan, so callers just
  * `.select`/`.filter` and the 100 TB read stays minimal. No caching here:
  * each query composes its own plan so the optimizer sees end-to-end.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` has shipped in two physical layouts across driver
    * testdata generations: INT64 TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects, so it's read nanos-as-long and
    * integer-divided to micros (a plain `/` would go through double and
    * lose precision above 2^53 ns) — and plain TIMESTAMP(MICROS) NTZ.
    * Probe the resolved schema and normalize either to session-zone
    * TimestampType (the session pins UTC, so NTZ→TZ is value-preserving
    * and matches the DuckDB oracle's naive timestamps).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
