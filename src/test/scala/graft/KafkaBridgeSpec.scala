package graft

import graft.streaming.KafkaBridge
import org.apache.spark.sql.functions._

/** The Kafka deployment seam: in-sandbox there is no broker and no
  * connector jar, so these tests pin (a) the exact reader/writer options a
  * deployment gets, (b) that the disabled path hands back the envelope
  * twin untouched, and (c) that the enabled path genuinely reaches Spark's
  * DataSource lookup for "kafka" — i.e. the only thing missing in-sandbox
  * is the provider jar, not wiring.
  */
class KafkaBridgeSpec extends SparkSpec {
  import spark.implicits._

  test("source/sink options pin the consumer contract") {
    val c = KafkaBridge.KafkaConf(enabled = true,
      bootstrap = "b1:9092,b2:9092", startingOffsets = "earliest")
    assert(KafkaBridge.sourceOptions(c, Seq("accidents", "weather")) == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "accidents,weather",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false"))
    assert(KafkaBridge.sinkOptions(c, "accidents_by_time") == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "topic" -> "accidents_by_time"))
  }

  test("conf defaults: disabled, localhost bootstrap, earliest offsets") {
    val c = KafkaBridge.conf(spark)
    assert(!c.enabled)
    assert(c.bootstrap == "localhost:9092")
    assert(c.startingOffsets == "earliest")
  }

  test("disabled: source returns the envelope twin unchanged") {
    val twin = Seq(("t1", "[{\"a\":1}]")).toDF("topic", "payload")
    val got = KafkaBridge.source(spark, Seq("t1"), twin)
    assert(got eq twin)
  }

  test("enabled: the path reaches Spark's kafka DataSource lookup") {
    val s2 = SparkSpec.session.newSession()
    s2.conf.set("spark.graft.kafka.enabled", "true")
    s2.conf.set("spark.graft.kafka.bootstrap", "broker:9092")
    val e = intercept[Throwable] {
      KafkaBridge.source(s2, Seq("accidents"),
        fail("envelope twin must not be evaluated when enabled"))
    }
    // in-sandbox the provider jar is absent: Spark's lookup must be the
    // failure point, proving format("kafka") is actually on this path
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("shared codec round-trips the list-envelope message contract") {
    import org.apache.spark.sql.types._
    val recSchema = ArrayType(StructType(Seq(
      StructField("event_id", LongType), StructField("v", DoubleType))))
    val rows = Seq((1L, 2.5), (2L, 0.5), (3L, 4.0)).toDF("event_id", "v")
    val msg = rows.agg(collect_list(struct(col("event_id"), col("v"))).as("l"))
      .select(to_json(col("l")).as("payload"))
    val back = msg
      .select(KafkaBridge.decodeListEnvelope(col("payload"), recSchema).as("m"))
      .select("m.event_id", "m.v").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(back.toSeq == Seq((1L, 2.5), (2L, 0.5), (3L, 4.0)))
  }
}
