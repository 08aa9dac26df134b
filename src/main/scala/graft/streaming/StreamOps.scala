package graft.streaming

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming layer (SURVEY.md §2.9): the reference's Kafka topics carry
  * complete batch aggregates (no watermarks/windows exist there), so the
  * parity surface is `readStream → aggregate → complete-mode sink`; the
  * engine's north-star extensions add event-time windows + watermarks and
  * session assignment.
  *
  * Kafka itself isn't in the container; the sources here are file streams
  * and (in tests) MemoryStream — the Kafka-shaped part is the JSON
  * envelope: S8 = `from_json` decode of a topic payload, S9 = `to_json`
  * encode of the aggregate, exactly the consumer's contract
  * (kafka/consumer.py:17-43).
  *
  * Scale: complete-mode aggregates keep only (key → agg) state — bounded
  * by group cardinality, not stream length. The windowed variants bound
  * state by watermark horizon. File-stream reads use AvailableNow so a
  * backlog is processed in rate-limited batches rather than one giant
  * micro-batch.
  */
object StreamOps {

  /** Streaming schema for events.parquet, parameterized by the physical
    * `ts` layout (file streams need an explicit schema). The driver's
    * testdata has shipped `ts` both as INT64 TIMESTAMP(NANOS) — readable
    * only as raw long — and as TIMESTAMP(MICROS) NTZ, so the schema is
    * probed from the batch footer (one cheap metadata read) rather than
    * hardcoded; see [[graft.Tables.events]].
    */
  def eventsRawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The physical type of `ts` in this dir's events.parquet. */
  def eventsTsType(s: SparkSession, dir: String): DataType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet").schema("ts").dataType
  }

  /** Normalize a raw `ts` column to session-zone TimestampType (the
    * session pins UTC) whichever physical layout it came from.
    */
  def normTs(c: Column, tsType: DataType): Column = tsType match {
    case LongType         => expr(s"timestamp_micros(${c.toString} DIV 1000)")
    case TimestampNTZType => c.cast(TimestampType)
    case _                => c
  }

  /** S8 — file-stream source over the events table, ts normalized to
    * TimestampType (mirrors Tables.events).
    */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val tsT = eventsTsType(s, dir)
    s.readStream.schema(eventsRawSchema(tsT))
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
      .withColumn("ts", normTs(col("ts"), tsT))
  }

  /** Run a streaming aggregate to a memory sink with AvailableNow and
    * return the final complete-mode snapshot as a DataFrame.
    */
  def runToSnapshot(agg: DataFrame, name: String): DataFrame = {
    val s = agg.sparkSession
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", s"/root/repo/target/scratch/ckpt_$name")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }

  /** One row per user_id: the row with the greatest (ts, event_id) —
    * event_id breaks timestamp ties, so "latest" is total and
    * deterministic. `max_by` over the packed struct is a plain aggregate:
    * map-side partial collapse, one key-sized shuffle, no window sort.
    */
  def latestPerKey(df: DataFrame): DataFrame =
    df.groupBy("user_id")
      .agg(max_by(
        struct(col("event_type"), col("value"), col("ts"), col("event_id")),
        struct(col("ts"), col("event_id"))).as("r"))
      .select(col("user_id"), col("r.event_type"), col("r.value"),
        col("r.ts"), col("r.event_id"))

  /** The foreachBatch merge body: collapse the incoming batch, union the
    * existing store, keep the per-key latest, swap via a staging dir.
    */
  def upsertLatest(batch: DataFrame, store: String): Unit = {
    val s = batch.sparkSession
    val incoming = latestPerKey(batch)
    val merged =
      try latestPerKey(s.read.parquet(store).unionByName(incoming))
      catch { case _: org.apache.spark.sql.AnalysisException => incoming }
    merged.write.mode("overwrite").parquet(store + ".tmp")
    rmPath(store)
    if (!new java.io.File(store + ".tmp").renameTo(new java.io.File(store)))
      sys.error(s"upsert swap failed for $store")
  }

  /** Per-micro-batch CDC merge with TOMBSTONE RETENTION (the streaming
    * lakehouse MERGE): store ∪ batch → one per-key argmax on (seq, …),
    * keeping D rows IN the store — dropping a tombstone at merge time
    * would let a late-arriving lower-seq insert resurrect the key in a
    * later batch. Deletes filter once, at read time. n accumulates the
    * versions seen per key across batches (the q_cdc_merge n_versions
    * contract). Same swap discipline as [[upsertLatest]].
    */
  def cdcBatchMerge(batch: DataFrame, store: String): Unit = {
    val s = batch.sparkSession
    val incoming = batch.withColumn("n", lit(1L))
    val all =
      try s.read.parquet(store).unionByName(incoming)
      catch { case _: org.apache.spark.sql.AnalysisException => incoming }
    val merged = all.groupBy("k")
      .agg(sum(col("n")).as("n"),
        max(struct(col("seq"), col("op"), col("status"), col("price")))
          .as("f"))
      .select(col("k"), col("f.seq").as("seq"), col("f.op").as("op"),
        col("f.status").as("status"), col("f.price").as("price"), col("n"))
    merged.write.mode("overwrite").parquet(store + ".tmp")
    rmPath(store)
    if (!new java.io.File(store + ".tmp").renameTo(new java.io.File(store)))
      sys.error(s"cdc swap failed for $store")
  }

  private def rmPath(path: String): Unit = {
    val dir = new java.io.File(path)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (dir.exists()) rm(dir)
  }

  /** Run `body` with a reduced shuffle-partition count. Stateful streaming
    * operators allocate one state store per shuffle partition PER state
    * op and micro-batch — at local[32] the default 32 partitions mean 32
    * store dirs + snapshot files per batch for state that is a few
    * thousand keys. Dropping to 8 for the state-heavy queries cuts that
    * fixed cost 4× without touching semantics (the partition count is a
    * physical knob; every result here is an aggregate with a total ORDER
    * BY). On a real cluster this is the same tuning call, sized to
    * executor count instead. The conf is restored afterwards; the
    * partition count is pinned into each new checkpoint, and these
    * queries recreate their checkpoint per run.
    */
  private def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Run `body` with the RocksDB state store provider (required by
    * transformWithState; also the production store for state beyond heap),
    * restoring the session default after.
    */
  /** MG summary capacity for the GATED runs: the corpus's distinct-user
    * count + 1, so the summary provably never evicts and its counts are
    * exact at any scale factor — the regime where the batch oracle
    * applies. One cheap batch aggregate; production callers pass a fixed
    * capacity and accept the documented n/(capacity+1) bound instead.
    */
  private def exactCapacity(s: SparkSession, d: String): Int =
    math.max(512,
      Tables.events(s, d).agg(count_distinct(col("user_id")).as("n"))
        .head.getLong(0).toInt + 1)

  private def withRocksDbState[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev.fold(s.conf.unset(key))(s.conf.set(key, _))
  }

  /** Sentinel flush row timestamp (2100-01-01) in the layout the events
    * source actually ships (raw nanos / NTZ / TZ — see Tables.events).
    */
  private def sentinelTsValue(tsT: DataType): Any = tsT match {
    case LongType         => 4102444800000000000L // raw nanos
    case TimestampNTZType => java.time.LocalDateTime.of(2100, 1, 1, 0, 0)
    case _                => java.sql.Timestamp.from(
      java.time.Instant.parse("2100-01-01T00:00:00Z"))
  }

  /** Write a one-row flush-sentinel parquet into a staged source dir.
    * Each sentinel file is one AvailableNow trigger (maxFilesPerTrigger=1)
    * that advances the watermark past every real window; N chained
    * stateful operators need N sentinels, because watermark advancement
    * reaches operator k one committed micro-batch after operator k-1.
    */
  private def writeSentinelFile(s: SparkSession, tsT: DataType,
                                scratch: String, name: String, id: Long): Unit = {
    val tmp = scratch + "_tmp"
    s.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(
          id, sentinelTsValue(tsT), -1L, "flush", 0.0, "{}")),
        eventsRawSchema(tsT))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$scratch/$name.parquet"))
    rmPath(tmp)
  }

  private def cleanCheckpoint(name: String): Unit = {
    val dir = new java.io.File(s"/root/repo/target/scratch/ckpt_$name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    if (dir.exists()) rm(dir)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K4 as a stream: hourly counts, complete mode — must equal the batch
    // aggregate (same oracle as q_k4_accidents_by_time).
    "q_stream_hourly" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_hourly")
      val agg = eventsStream(s, d)
        .groupBy(hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
      runToSnapshot(agg, "stream_hourly").orderBy("h")
    }},

    // North-star: event-time tumbling window + watermark. AvailableNow
    // processes the full file backlog; complete mode emits every window.
    "q_stream_windowed" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_windowed")
      val agg = eventsStream(s, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      runToSnapshot(agg, "stream_windowed")
        .select(col("w.start").as("w_start"), col("cnt"), col("total"))
        .orderBy("w_start")
    }},

    // SKETCHES IN STREAMING STATE: per-window approximate distinct users
    // via HLL++ inside the windowed aggregate — the state per window is
    // the fixed-size HLL registers, not a user set, so window state stays
    // bounded at ANY user cardinality (the streaming twin of
    // q_approx_distinct's scale argument). Gated with the boolean-contract
    // pattern: the snapshot's estimate must sit within 2% of the batch
    // exact distinct per window, which is deterministic for fixed data.
    "q_stream_hll_users" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_hll_users")
      val agg = eventsStream(s, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("__est"))
      val streamed = runToSnapshot(agg, "stream_hll_users")
        .select(col("w.start").as("w_start"), col("__est"))
      val exact = Tables.events(s, d)
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .select(col("w.start").as("w_start"), col("exact_users"))
      exact.join(streamed, Seq("w_start"))
        .select(col("w_start"), col("exact_users"),
          (abs(col("__est") - col("exact_users")) <=
            col("exact_users").cast("double") * 0.02).as("within_tol"))
        .orderBy("w_start")
    }},

    // North-star: SLIDING window (6h length, 3h slide) — every event lands
    // in exactly two windows; complete mode emits all of them.
    "q_stream_sliding" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_sliding")
      val agg = eventsStream(s, d)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"))
        .agg(count(lit(1)).as("cnt"))
      runToSnapshot(agg, "stream_sliding")
        .select(col("w.start").as("w_start"), col("cnt"))
        .orderBy("w_start")
    }},

    // North-star: session_window aggregation as a streaming query entry
    // (30-min gap), complete mode — session starts/sizes must equal the
    // batch lag+cumsum sessionization (q_sessionize's oracle family).
    "q_stream_session" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_session")
      val agg = eventsStream(s, d)
        .withColumn("ts", date_trunc("second", col("ts")))
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
      runToSnapshot(agg, "stream_session")
        .select(col("user_id"), col("w.start").as("sess_start"), col("n_events"))
        .orderBy("user_id", "sess_start")
    }},

    // S8+S9 — the Kafka JSON envelope round-trip: encode each event as a
    // topic message (to_json of the full struct), decode with from_json
    // (the consumer's json.loads, kafka/consumer.py:23), re-aggregate.
    "q_stream_json_envelope" -> { (s, d) =>
      val msgSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      Tables.events(s, d)
        .select(KafkaBridge.encodeMessage(col("event_id"), col("event_type"),
          col("value")).as("payload"))
        .select(KafkaBridge.decodeMessage(col("payload"), msgSchema).as("m"))
        .groupBy(col("m.event_type").as("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("m.value").cast(DecimalType(18, 2))).cast("double").as("total"))
        .orderBy("event_type")
    },

    // S8 — the reference consumer's ACTUAL message contract: each message
    // is a JSON LIST of records ("Se espera que cada mensaje ya sea una
    // lista de dicts", kafka/consumer.py:23,33; SURVEY S8). Producer side
    // batches each hour's records into ONE message via
    // to_json(collect_list(struct(...))); consumer side decodes with
    // from_json(ArrayType(StructType)) and explodes back to records. The
    // batch key bounds message size (a real producer batches per poll
    // window); collect_list order varies with partitioning but the decoded
    // MULTISET is partition-invariant, so the re-aggregation is exact.
    "q_stream_list_envelope" -> { (s, d) =>
      val recSchema = ArrayType(StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType))))
      val msgs = Tables.events(s, d)
        .groupBy(hour(col("ts")).as("h"))
        .agg(to_json(collect_list(
          struct(col("event_id"), col("event_type"), col("value")))).as("payload"))
        .select("payload")
      msgs.select(KafkaBridge.decodeListEnvelope(col("payload"), recSchema).as("m"))
        .groupBy(col("m.event_type").as("event_type"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("m.value").cast(DecimalType(18, 2))).cast("double").as("total"))
        .orderBy("event_type")
    },

    // LIVE DRIFT MONITOR — the production shape of q_psi_drift: the
    // reference population (weekday values) is a STATIC profile computed
    // once (bin edges = two scalars, per-bin counts = 10 rows), and the
    // current population is the live weekend feed whose 10 binned counts
    // are the ONLY streaming state (complete-mode groupBy over a 10-value
    // key — state is constant-size no matter the stream length). Each
    // snapshot joins the static profile and emits the PSI scalar; the
    // gate proves stream ≡ batch on the bounded source (same oracle as
    // q_psi_drift).
    "q_stream_psi" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_psi")
      val refEv = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("value").cast("double").as("v"),
          (weekday(col("ts")) <= 3).as("is_ref"))
      val mm = refEv.filter(col("is_ref"))
        .agg(min(col("v")).as("lo"), max(col("v")).as("hi")).head()
      // empty reference population → null min/max: degrade like the batch
      // twin (zero-width profile at 0, all counts land in bin 0) instead
      // of NPEing on getDouble (ADVICE r8)
      val (lo, hi) =
        if (mm.isNullAt(0)) (0.0, 0.0)
        else (mm.getDouble(0), mm.getDouble(1))
      def binOf(v: Column) =
        if (hi == lo) lit(0).cast("int")
        else greatest(least(floor((v - lo) * 10.0 / (hi - lo)), lit(9.0)),
          lit(0.0)).cast("int")
      val cr = refEv.filter(col("is_ref"))
        .select(binOf(col("v")).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cr"))
      val curAgg = eventsStream(s, d)
        .filter(col("value").isNotNull && weekday(col("ts")) >= 4)
        .select(binOf(col("value").cast("double")).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cc"))
      val cc = runToSnapshot(curAgg, "stream_psi")
      graft.operators.Evolution.psiOfBinCounts(
        cr.join(cc, Seq("bin"), "full_outer")
          .na.fill(0L, Seq("cr", "cc")))
    }},

    // LIVE CUSUM CONTROL CHART — the q_cusum fold as a stream: the
    // streaming STATE is the per-day value sums (complete-mode groupBy
    // day — calendar-bounded keys, constant per-key size), and each
    // snapshot runs the sequential CUSUM fold on that day frame (the
    // q_stream_psi aggregate-on-snapshot shape: recursions don't
    // stream, bounded aggregates do, so keep the recursion ON the
    // snapshot). Ops teams run exactly this against a revenue/volume
    // feed so a level shift pages mid-day. Gate: stream ≡ batch (the
    // oracle recomputes the identical fold over events at rest).
    "q_stream_cusum" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_cusum")
      val daily = eventsStream(s, d).filter(col("value").isNotNull)
        .groupBy(to_date(col("ts")).as("day"))
        .agg((sum(col("value").cast(DecimalType(18, 2))) * 100)
          .cast("long").as("rc"))
      graft.operators.Analytics.cusumOfDaily(
        runToSnapshot(daily, "stream_cusum"))
    }},

    // LIVE SRM MONITOR — q_srm_check as a stream: per-arm DISTINCT-user
    // counts maintained as streaming state (complete-mode two-level
    // aggregate: dropDuplicates on (arm, user) then a 2-key count — state
    // is user-cardinality keys, the same class as q_stream_hll_users'
    // exact twin), χ² computed on each snapshot. Experiment platforms run
    // exactly this against the live assignment feed so a broken
    // randomizer pages within minutes, not at readout. Gate: stream ≡
    // batch on the bounded source (same oracle as q_srm_check).
    "q_stream_srm" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_srm")
      val bucket = conv(substring(md5(col("user_id").cast("string")), 1, 4),
        16, 10).cast("long") % 2
      val agg = eventsStream(s, d)
        .select(col("user_id"),
          when(bucket === 0, "a").otherwise("b").as("arm"))
        .dropDuplicates("arm", "user_id")
        .groupBy("arm").agg(count(lit(1)).as("cnt"))
      val c = runToSnapshot(agg, "stream_srm")
      val w = c.agg(
        coalesce(sum(when(col("arm") === "a", col("cnt"))), lit(0L)).as("na"),
        coalesce(sum(when(col("arm") === "b", col("cnt"))), lit(0L)).as("nb"))
      val nD = (col("na") + col("nb")).cast("double")
      val e = nD / 2.0
      val chi2 = (col("na").cast("double") - e) * (col("na").cast("double") - e) / e +
        (col("nb").cast("double") - e) * (col("nb").cast("double") - e) / e
      w.select(col("na"), col("nb"), round(chi2, 6).as("chi2"),
        (chi2 > 3.841459).as("srm_detected"))
    }},

    // BOUNDED-STATE LIVE SRM — q_stream_srm with the state class fixed:
    // the exact monitor keeps one state key per (arm, user), which is
    // assignment-feed cardinality at web scale. Here the ONLY streaming
    // state is 2 HLL++ register arrays (one per arm, fixed KBs at any
    // user cardinality — the sketch-state pattern q_stream_hll_users
    // establishes for windows). HLL register merges are max-based and
    // order-independent, so the complete-mode snapshot estimate is a
    // pure function of the data: the gate asserts the streamed estimate
    // EQUALS the batch sketch estimate per arm (stream ≡ batch-HLL),
    // plus the 2% contract vs exact per-arm distincts. na/nb/chi2 stay
    // the EXACT batch values (same readout as q_srm_check): the sketch
    // monitors, the readout is exact.
    // LIVE BAYESIAN A/B — q_bayes_ab as a stream: the streaming state is
    // the two arms' (n, Σcents, Σcents²) moment rows (complete-mode
    // groupBy over a 2-value key — constant-size state at any stream
    // length; the sums are exact Long/DECIMAL, so the snapshot is a pure
    // function of the data), and each snapshot applies the IDENTICAL
    // posterior expression tree via Analytics.bayesAbFinish. Gate:
    // stream ≡ batch on the bounded source (same oracle as q_bayes_ab).
    "q_stream_bayes_ab" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_bayes_ab")
      val agg = eventsStream(s, d)
        .filter(col("event_type").isin("purchase", "click") &&
          col("value").isNotNull)
        .select((col("event_type") === "purchase").as("t"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("cents"))
        .groupBy("t")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          sum((col("cents") * col("cents")).cast(DecimalType(38, 0)))
            .as("ss"))
      val snap = runToSnapshot(agg, "stream_bayes_ab")
      val m = snap.agg(
        coalesce(sum(when(col("t"), col("n"))), lit(0L)).as("nb"),
        coalesce(sum(when(!col("t"), col("n"))), lit(0L)).as("na"),
        coalesce(sum(when(col("t"), col("s"))), lit(0L)).as("sb"),
        coalesce(sum(when(!col("t"), col("s"))), lit(0L)).as("sa"),
        coalesce(sum(when(col("t"), col("ss"))),
          lit(0).cast(DecimalType(38, 0))).as("ssb"),
        coalesce(sum(when(!col("t"), col("ss"))),
          lit(0).cast(DecimalType(38, 0))).as("ssa"))
      graft.operators.Analytics.bayesAbFinish(m)
    }},

    "q_stream_srm_hll" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_srm_hll")
      def armOf = {
        val bucket = conv(substring(md5(col("user_id").cast("string")), 1, 4),
          16, 10).cast("long") % 2
        when(bucket === 0, "a").otherwise("b").as("arm")
      }
      val agg = eventsStream(s, d)
        .select(col("user_id"), armOf)
        .groupBy("arm")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("est"))
      val streamed = runToSnapshot(agg, "stream_srm_hll")
      val batch = Tables.events(s, d)
        .select(col("user_id"), armOf)
        .groupBy("arm")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("best"),
          countDistinct(col("user_id")).as("exact"))
      val w = streamed.join(batch, Seq("arm")).agg(
        coalesce(sum(when(col("arm") === "a", col("exact"))), lit(0L)).as("na"),
        coalesce(sum(when(col("arm") === "b", col("exact"))), lit(0L)).as("nb"),
        min((col("est") === col("best")).cast("int")).as("__eq"),
        min((abs(col("est") - col("exact")) <=
          col("exact").cast("double") * 0.02).cast("int")).as("__tol"))
      val nD = (col("na") + col("nb")).cast("double")
      val e = nD / 2.0
      val chi2 = (col("na").cast("double") - e) * (col("na").cast("double") - e) / e +
        (col("nb").cast("double") - e) * (col("nb").cast("double") - e) / e
      w.select(col("na"), col("nb"), round(chi2, 6).as("chi2"),
        (chi2 > 3.841459).as("srm_detected"),
        (col("__eq") === 1).as("stream_eq_batch_sketch"),
        (col("__tol") === 1).as("within_tol"))
    }},

    // LIVE mSPRT MONITOR — q_msprt's always-valid statistic as a stream:
    // the batch query replays the whole day-spine trajectory; the live
    // twin maintains the CURRENT cumulative per-arm (users, converters)
    // as streaming state and evaluates the log mixture LR at each
    // snapshot — the number an experimenter may glance at at ANY moment
    // without alpha inflation (that is the mSPRT contract). State =
    // distinct (arm, user) keys in two complete-mode dedup+count
    // queries (the q_stream_srm exact-state class; q_stream_srm_hll
    // shows the sketch-bounded variant of exactly this state). Gate:
    // stream ≡ batch cumulative at end-of-feed (derived oracle — the
    // final q_msprt row without the path-dependent `crossed`).
    "q_stream_msprt" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_msprt_n")
      cleanCheckpoint("stream_msprt_x")
      val arm = when(
        conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 2 === 0, "c").otherwise("t")
      def base = eventsStream(s, d)
        .select(col("user_id"), col("event_type")).withColumn("arm", arm)
      val nAgg = base.dropDuplicates("arm", "user_id")
        .groupBy("arm").agg(count(lit(1)).as("n"))
      val xAgg = base.filter(col("event_type") === "purchase")
        .dropDuplicates("arm", "user_id")
        .groupBy("arm").agg(count(lit(1)).as("x"))
      val nSnap = runToSnapshot(nAgg, "stream_msprt_n")
      val xSnap = runToSnapshot(xAgg, "stream_msprt_x")
      val w = nSnap.join(xSnap, Seq("arm"), "left")
        .na.fill(0L, Seq("x"))
        .agg(
          coalesce(sum(when(col("arm") === "c", col("n"))), lit(0L)).as("n_c"),
          coalesce(sum(when(col("arm") === "c", col("x"))), lit(0L)).as("x_c"),
          coalesce(sum(when(col("arm") === "t", col("n"))), lit(0L)).as("n_t"),
          coalesce(sum(when(col("arm") === "t", col("x"))), lit(0L)).as("x_t"))
      val nc = col("n_c").cast("double")
      val nt = col("n_t").cast("double")
      val p = (col("x_c") + col("x_t")).cast("double") / (nc + nt)
      val s2 = p * (lit(1.0) - p) * (lit(1.0) / nc + lit(1.0) / nt)
      val dlt = col("x_t").cast("double") / nt - col("x_c").cast("double") / nc
      val t2 = lit(0.01 * 0.01)
      val llr = lit(0.5) * log(s2 / (s2 + t2)) +
        dlt * dlt * t2 / (lit(2.0) * s2 * (s2 + t2))
      w.select(col("n_c"), col("x_c"), col("n_t"), col("x_t"),
        when(s2 > 0, round(llr, 6)).as("llr"),
        when(s2 > 0, llr >= math.log(1.0 / 0.05)).otherwise(lit(false))
          .as("sig_now"))
    }},

    // K7 as a stream: the crossings topic in complete mode — equals the
    // batch aggregate (same oracle as q_k7_crossings_vs_lesions).
    "q_stream_crossings" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_crossings")
      val agg = eventsStream(s, d)
        .groupBy(col("event_type").as("crossing_type"))
        .agg(count(lit(1)).as("crossings"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("lesions_total"))
      runToSnapshot(agg, "stream_crossings").orderBy("crossing_type")
    }},

    // Stream-static broadcast join: the stream enriched against a static
    // dimension (the geocode-lookup shape) before aggregating — at scale
    // the static side broadcasts once per micro-batch, no stream shuffle.
    "q_stream_enriched" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_enriched")
      val nations = broadcast(Tables.nation(s, d).select("n_nationkey", "n_name"))
      val agg = eventsStream(s, d)
        .withColumn("nkey", pmod(col("user_id"), lit(25)).cast("int"))
        .join(nations, col("nkey") === col("n_nationkey"), "left")
        .groupBy(coalesce(col("n_name"), lit("unknown")).as("region"))
        .agg(count(lit(1)).as("cnt"))
      runToSnapshot(agg, "stream_enriched").orderBy("region")
    }},

    // North-star: STREAM-STREAM interval join — each event joined to the
    // same user's events in the following 10 minutes. Both sides carry
    // watermarks and the join condition bounds event time on both, so the
    // join state is horizon-bounded (the stream-stream requirement);
    // inner-join matches emit as they form (append mode). The memory-sink
    // pair table is then batch-aggregated per hour, and the oracle is the
    // plain batch self-join — stream ≡ batch on a bounded source.
    "q_stream_interval_join" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_interval_join")
      val l = eventsStream(s, d)
        .select(col("event_id").as("l_id"), col("ts").as("l_ts"),
          col("user_id").as("l_user"))
        .withWatermark("l_ts", "1 hour")
      val r = eventsStream(s, d)
        .select(col("event_id").as("r_id"), col("ts").as("r_ts"),
          col("user_id").as("r_user"))
        .withWatermark("r_ts", "1 hour")
      val pairs = l.join(r, expr(
        """l_user = r_user AND
          |r_ts > l_ts AND r_ts <= l_ts + interval 10 minutes""".stripMargin))
      val q = pairs.writeStream.format("memory").queryName("stream_interval_join")
        .outputMode("append")
        .option("checkpointLocation",
          "/root/repo/target/scratch/ckpt_stream_interval_join")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("stream_interval_join")
        .groupBy(hour(col("l_ts")).as("h"))
        .agg(count(lit(1)).as("pairs"))
        .orderBy("h")
    }},

    // North-star: stream-stream LEFT OUTER interval join. Unlike the inner
    // variant, null-extended rows for unmatched lefts can only emit once
    // the watermark proves no match can still arrive — which never happens
    // for the tail of a bounded backlog unless something advances the
    // watermark past it. The flush idiom: stage the source as TWO files
    // (the real events + one far-future sentinel row) and rate-limit to
    // one file per micro-batch, so the sentinel batch advances the global
    // watermark beyond every join window and the engine's no-data batch
    // evicts+emits the remaining unmatched lefts before AvailableNow
    // terminates. The sentinel user (-1) matches nothing and is filtered
    // from the result; the oracle is the plain batch LEFT JOIN.
    "q_stream_left_join" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_left_join")
      val scratch = "/root/repo/target/scratch/left_join_src"
      rmPath(scratch); new java.io.File(scratch).mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(s"$scratch/00_events.parquet"))
      // sentinel: 2100-01-01 UTC, schema-identical to events (whichever
      // physical ts layout this testdata generation shipped)
      val tsT = eventsTsType(s, d)
      val sentinelTs: Any = tsT match {
        case LongType         => 4102444800000000000L // raw nanos
        case TimestampNTZType => java.time.LocalDateTime.of(2100, 1, 1, 0, 0)
        // tz-adjusted TIMESTAMP(MICROS): createDataFrame wants an Instant/
        // java.sql.Timestamp, not LocalDateTime
        case _                => java.sql.Timestamp.from(
          java.time.Instant.parse("2100-01-01T00:00:00Z"))
      }
      val tmp = scratch + "_tmp"
      s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(
            -1L, sentinelTs, -1L, "flush", 0.0, "{}")),
          eventsRawSchema(tsT))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$scratch/01_flush.parquet"))
      rmPath(tmp)

      def side(idAs: String, tsAs: String, userAs: String) =
        s.readStream.schema(eventsRawSchema(tsT))
          .option("maxFilesPerTrigger", "1")
          .parquet(scratch)
          .withColumn("ts", normTs(col("ts"), tsT))
          .select(col("event_id").as(idAs), col("ts").as(tsAs),
            col("user_id").as(userAs))
          .withWatermark(tsAs, "1 hour")
      val pairs = side("l_id", "l_ts", "l_user")
        .join(side("r_id", "r_ts", "r_user"), expr(
          """l_user = r_user AND
            |r_ts > l_ts AND r_ts <= l_ts + interval 10 minutes""".stripMargin),
          "left_outer")
      val q = pairs.writeStream.format("memory").queryName("stream_left_join")
        .outputMode("append")
        .option("checkpointLocation",
          "/root/repo/target/scratch/ckpt_stream_left_join")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("stream_left_join")
        .filter(col("l_user") =!= -1L)
        .groupBy(hour(col("l_ts")).as("h"))
        .agg(count(lit(1)).as("total"), count(col("r_id")).as("matched"))
        .orderBy("h")
    }},

    // Custom arbitrary state (flatMapGroupsWithState): per-user running
    // totals in update mode — the state op the built-in aggregates can't
    // express (the full API surface: state get/update per group, typed
    // output). Update-mode re-emits a user's row each batch it changes;
    // the final emission per user (max struct — n_events is monotone) is
    // the end-of-stream state, which must equal the plain batch aggregate.
    // STREAMING COUNT-MIN: the mergeability story made live — the
    // 4×512-cell CMS grows under streaming aggregation (bounded state:
    // d·w counters REGARDLESS of stream length or key cardinality, the
    // sketch's whole point vs q_stream_top_users' exact per-key state),
    // and the snapshot probes IDENTICALLY to the batch q_countmin:
    // stream ≡ batch ≡ DuckDB three ways because the md5 bucket scheme
    // is deterministic.
    "q_stream_countmin" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_countmin")
      val cells = eventsStream(s, d)
        .select(explode(array((0 until 4).map(r =>
          struct(lit(r).as("r"),
            graft.operators.Sketches.cmsBucket(r, col("user_id"))
              .as("bucket"))): _*)).as("p"))
        .groupBy(col("p.r").as("r"), col("p.bucket").as("bucket"))
        .agg(count(lit(1)).as("cell"))
      val q = cells.writeStream.format("memory")
        .queryName("stream_countmin")
        .outputMode("update")
        .option("checkpointLocation",
          "/root/repo/target/scratch/ckpt_stream_countmin")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val snap = s.table("stream_countmin")
        .groupBy("r", "bucket").agg(max(col("cell")).as("cell"))
      val exact = Tables.events(s, d)
        .groupBy(col("user_id").as("key")).agg(count(lit(1)).as("cnt"))
      graft.operators.Sketches.cmsProbe(snap, exact, 4, 10)
    }},

    "q_stream_state_totals" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_state_totals")
      val q = runningUserTotals(eventsStream(s, d)).toDF()
        .writeStream.format("memory").queryName("stream_state_totals")
        .outputMode("update")
        .option("checkpointLocation",
          "/root/repo/target/scratch/ckpt_stream_state_totals")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("stream_state_totals")
        .groupBy("user_id")
        .agg(max(struct(col("n_events"), col("total_cents"))).as("st"))
        .select(col("user_id"), col("st.n_events").as("n_events"),
          col("st.total_cents").as("total_cents"))
        .orderBy("user_id")
    }},

    // The transformWithState twin of q_stream_state_totals: same
    // semantics through the NEW typed-state API over RocksDB — both
    // state APIs gate against the identical batch oracle.
    "q_stream_tws_totals" -> { (s, d) => withStatePartitions(s, 8) {
      withRocksDbState(s) {
        cleanCheckpoint("stream_tws_totals")
        val q = runningUserTotalsTws(eventsStream(s, d)).toDF()
          .writeStream.format("memory").queryName("stream_tws_totals")
          .outputMode("update")
          .option("checkpointLocation",
            "/root/repo/target/scratch/ckpt_stream_tws_totals")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table("stream_tws_totals")
          .groupBy("user_id")
          .agg(max(struct(col("n_events"), col("total_cents"))).as("st"))
          .select(col("user_id"), col("st.n_events").as("n_events"),
            col("st.total_cents").as("total_cents"))
          .orderBy("user_id")
      }
    }},

    // LIVE MEDIAN — KLL sketch state per event_type (TypeKllProcessor):
    // fixed O(k log n/k) state at any stream length, the quantile member
    // of the bounded-state sketch family. Stream insertion order differs
    // from batch, so the estimate is gated by the sketch's own
    // ORDER-INDEPENDENT guarantee: the end-of-stream estimate's exact
    // rank must sit within the ±2% contract of q=0.5 (the q_kll_rollup
    // gate), with exact medians from the grouped X4 percentile frame.
    "q_stream_kll_median" -> { (s, d) => withStatePartitions(s, 8) {
      withRocksDbState(s) {
        cleanCheckpoint("stream_kll_median")
        val q = streamingKllMedian(eventsStream(s, d), 512).toDF()
          .writeStream.format("memory").queryName("stream_kll_median")
          .outputMode("update")
          .option("checkpointLocation",
            "/root/repo/target/scratch/ckpt_stream_kll_median")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val finals = s.table("stream_kll_median")
          .groupBy(col("event_type").as("grp"))
          .agg(max(struct(col("n_seen"), col("est_p50"))).as("st"))
          .select(col("grp"), col("st.n_seen").as("n"),
            col("st.est_p50").as("e"))
        val ev = Tables.events(s, d).select(col("event_type").as("grp"),
          col("value").cast("double").as("x"))
        val rank = ev.join(broadcast(finals), Seq("grp"))
          .groupBy("grp", "n", "e")
          .agg(sum(when(col("x") < col("e"), 1L).otherwise(0L)).as("lt"),
            sum(when(col("x") <= col("e"), 1L).otherwise(0L)).as("le"))
        val tolc = (col("lt") <= lit(0.52) * col("n")) &&
          (col("le") >= lit(0.48) * col("n"))
        graft.operators.Analytics
          .groupedExactPercentiles(ev, "grp", "x", Seq("exact_p50" -> 0.5))
          .join(rank, Seq("grp"))
          .select(col("grp"), col("exact_p50"), tolc.as("within_tol"))
          .orderBy("grp")
      }
    }},

    // MapState heavy hitters: q_stream_top_users' semantics through
    // transformWithState MapState over RocksDB — point-wise entry
    // updates instead of whole-map rewrites (see TypeTopUsersProcessor).
    "q_stream_top_users_tws" -> { (s, d) => withStatePartitions(s, 8) {
      withRocksDbState(s) {
        cleanCheckpoint("stream_top_users_tws")
        val q = streamingTopUsersTws(eventsStream(s, d), 3).toDF()
          .writeStream.format("memory").queryName("stream_top_users_tws")
          .outputMode("update")
          .option("checkpointLocation",
            "/root/repo/target/scratch/ckpt_stream_top_users_tws")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table("stream_top_users_tws")
          .groupBy("event_type", "rank")
          .agg(max(struct(col("n_seen"), col("cnt"), col("user_id"))).as("st"))
          .select(col("event_type"), col("rank"),
            col("st.user_id").as("user_id"), col("st.cnt").as("cnt"))
          .orderBy("event_type", "rank")
      }
    }},

    // Bounded-state heavy hitters: q_stream_top_users' semantics through
    // a Misra-Gries summary in transformWithState value state — fixed
    // summary capacity regardless of user cardinality. The GATE pins the
    // provably-exact regime: capacity is auto-sized to the corpus's
    // distinct-user count (one cheap batch agg), so the summary never
    // evicts and the batch top-k oracle applies verbatim at EVERY scale
    // factor (the q_heavy_hitters trick — under eviction, per-batch row
    // order makes retained counts run-dependent, so no oracle can pin
    // them; this synthetic corpus has no heavy hitters clear of the MG
    // bound). The eviction path itself is pinned by Round6Spec's
    // capacity-bound and restart tests, where order effects are
    // controlled. state_size is emitted for those tests, not projected.
    "q_stream_top_users_mg" -> { (s, d) => withStatePartitions(s, 8) {
      withRocksDbState(s) {
        cleanCheckpoint("stream_top_users_mg")
        val cap = exactCapacity(s, d)
        val q = streamingTopUsersMg(eventsStream(s, d), 3, cap).toDF()
          .writeStream.format("memory").queryName("stream_top_users_mg")
          .outputMode("update")
          .option("checkpointLocation",
            "/root/repo/target/scratch/ckpt_stream_top_users_mg")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // Eviction guard (ADVICE r6): under eviction MG counts are run-
        // order-dependent lower bounds and the batch oracle no longer
        // applies. exactCapacity sizes the summary so that never happens
        // at gate scale — assert it, so a future SF/config change that
        // re-enters the eviction regime fails LOUDLY here instead of as a
        // mysterious hash mismatch downstream.
        val maxState = s.table("stream_top_users_mg")
          .agg(max(col("state_size"))).head().getLong(0)
        require(maxState < cap,
          s"MG summary hit capacity ($maxState >= $cap): eviction regime, " +
            "batch oracle invalid — raise capacity for the gated run")
        s.table("stream_top_users_mg")
          .groupBy("event_type", "rank")
          .agg(max(struct(col("n_seen"), col("cnt"), col("user_id"))).as("st"))
          .select(col("event_type"), col("rank"),
            col("st.user_id").as("user_id"), col("st.cnt").as("cnt"))
          .orderBy("event_type", "rank")
      }
    }},

    // STATE INTROSPECTION — the state-source reader ("statestore"
    // format) over a transformWithState checkpoint: operational surface
    // for debugging/auditing live state without touching the query. Runs
    // the MG heavy-hitter stream to completion, then reads its ValueState
    // back as a DataFrame and checks it against the batch ground truth —
    // at capacity 512 with sf0.01's 150 users/type the summary holds
    // exactly the distinct-user set, so entry count = count(DISTINCT
    // user_id) and n_seen = count(*), per type.
    "q_stream_state_reader" -> { (s, d) => withStatePartitions(s, 8) {
      withRocksDbState(s) {
        cleanCheckpoint("stream_state_reader")
        val ckpt = "/root/repo/target/scratch/ckpt_stream_state_reader"
        val q = streamingTopUsersMg(eventsStream(s, d), 3, exactCapacity(s, d)).toDF()
          .writeStream.format("memory").queryName("stream_state_reader")
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.format("statestore")
          .option("path", ckpt)
          .option("stateVarName", "mg")
          .load()
          // (capacity auto-sized as in q_stream_top_users_mg: no eviction
          // at gate scale, so the summary holds the exact distinct set)
          .select(col("key.value").as("event_type"),
            size(col("value.users")).cast("long").as("n_users"),
            col("value.n_seen").as("n_seen"))
          .orderBy("event_type")
      }
    }},

    // Streaming heavy hitters (custom state): per-type top-3 users,
    // update-mode; the final emission per (type, rank) — selected by the
    // monotone n_seen, not sink order — must equal the batch
    // count+row_number oracle. See streamingTopUsers for the
    // bounded-state (Misra-Gries) posture at scale.
    "q_stream_top_users" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_top_users")
      val q = streamingTopUsers(eventsStream(s, d), 3).toDF()
        .writeStream.format("memory").queryName("stream_top_users")
        .outputMode("update")
        .option("checkpointLocation",
          "/root/repo/target/scratch/ckpt_stream_top_users")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("stream_top_users")
        .groupBy("event_type", "rank")
        .agg(max(struct(col("n_seen"), col("cnt"), col("user_id"))).as("st"))
        .select(col("event_type"), col("rank"),
          col("st.user_id").as("user_id"), col("st.cnt").as("cnt"))
        .orderBy("event_type", "rank")
    }},

    // S9 — the producer path via foreachBatch: each complete-mode snapshot
    // is JSON-encoded (the topic message payload, kafka/consumer.py:23
    // consumer contract) and overwritten to the "topic" sink; the query
    // then plays the consumer: read back, from_json-decode, return. The
    // final snapshot must equal the batch aggregate.
    "q_stream_topic_sink" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_topic_sink")
      val sinkPath = "/root/repo/target/scratch/topic_accidents_by_time"
      val agg = eventsStream(s, d)
        .groupBy(hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("cnt"))
      val q = agg.writeStream
        .outputMode("complete")
        .option("checkpointLocation", "/root/repo/target/scratch/ckpt_stream_topic_sink")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.select(KafkaBridge.encodeMessage(col("h"), col("cnt")).as("payload"))
            .write.mode("overwrite").parquet(sinkPath)
        }
        .start()
      q.awaitTermination()
      val msgSchema = StructType(Seq(
        StructField("h", IntegerType), StructField("cnt", LongType)))
      s.read.parquet(sinkPath)
        .select(KafkaBridge.decodeMessage(col("payload"), msgSchema).as("m"))
        .select(col("m.h").as("h"), col("m.cnt").as("cnt"))
        .orderBy("h")
    }},

    // Streaming UPSERT sink: foreachBatch merges each micro-batch into a
    // keyed store keeping the most-recent row per user — the CDC /
    // materialized-view sink (Kafka compacted-topic semantics) the
    // reference's consumer approximates by overwriting whole snapshots.
    // Recency is decided by (ts, event_id), never arrival order, so
    // out-of-order and replayed batches converge to the same table (the
    // cross-batch case is pinned in StreamingSpec with an out-of-order
    // MemoryStream). Each merge collapses the batch map-side, unions the
    // existing store, and re-collapses — state lives in the store, not
    // the stream. Parquet stands in for an ACID table: the merge writes
    // to a staging dir and swaps, because overwriting a path while the
    // plan reads it is undefined; on a real deployment this foreachBatch
    // body is a MERGE INTO an Iceberg/Delta table.
    // STREAMING CDC APPLY — q_cdc_merge's changelog driven through a
    // real file stream in three waves (base / updates+inserts /
    // deletes, maxFilesPerTrigger=1 so the merge crosses micro-batch
    // boundaries) into a foreachBatch lakehouse MERGE with tombstone
    // retention. seq-argmax makes the merge ARRIVAL-ORDER-INDEPENDENT
    // (a delete arriving before its insert cannot resurrect), which is
    // the property that lets the same code run at-least-once at 100 TB.
    // Gate: final store state ≡ the batch q_cdc_merge oracle verbatim.
    "q_stream_cdc_apply" -> { (s, d) => withStatePartitions(s, 8) {
      import org.apache.spark.sql.types._
      cleanCheckpoint("stream_cdc")
      val dir = "/root/repo/target/scratch/cdc_log"
      val store = "/root/repo/target/scratch/cdc_store"
      rmPath(dir); rmPath(store); rmPath(store + ".tmp")
      val base = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"),
        lit(0L).as("seq"), lit("I").as("op"))
      val upd = base.filter(col("k") % 10 === 0)
        .select(col("k"), lit("X").as("status"),
          (col("price") + 1000).cast(DecimalType(18, 2)).as("price"),
          lit(1L).as("seq"), lit("U").as("op"))
      val del = base.filter(col("k") % 100 === 0)
        .select(col("k"), lit(null).cast("string").as("status"),
          lit(null).cast(DecimalType(18, 2)).as("price"),
          lit(2L).as("seq"), lit("D").as("op"))
      val ins = base.filter(col("k") < 50)
        .select((col("k") + 900000000L).as("k"), lit("N").as("status"),
          lit(42.42).cast(DecimalType(18, 2)).as("price"),
          lit(1L).as("seq"), lit("I").as("op"))
      base.coalesce(1).write.mode("append").parquet(dir)
      upd.unionByName(ins).coalesce(1).write.mode("append").parquet(dir)
      del.coalesce(1).write.mode("append").parquet(dir)
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("status", StringType),
        StructField("price", DecimalType(18, 2)),
        StructField("seq", LongType), StructField("op", StringType)))
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .writeStream
        .option("checkpointLocation",
          "/root/repo/target/scratch/ckpt_stream_cdc")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          cdcBatchMerge(batch, store)
        }
        .start()
      q.awaitTermination()
      s.read.parquet(store).filter(col("op") =!= "D")
        .select(col("k").as("o_orderkey"), col("status").as("final_status"),
          col("price").cast("double").as("final_price"),
          col("n").as("n_versions"))
        .orderBy("o_orderkey")
    }},

    "q_stream_upsert" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_upsert")
      val store = "/root/repo/target/scratch/upsert_store"
      rmPath(store); rmPath(store + ".tmp")
      val q = eventsStream(s, d)
        .select("user_id", "event_type", "value", "ts", "event_id")
        .writeStream
        .option("checkpointLocation", "/root/repo/target/scratch/ckpt_stream_upsert")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          upsertLatest(batch, store)
        }
        .start()
      q.awaitTermination()
      s.read.parquet(store)
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"))
        .orderBy("user_id")
    }},

    // Streaming dedup: the stream unioned with itself (every event arrives
    // twice) then dropDuplicatesWithinWatermark on the event id — the
    // aggregate must equal the single-copy batch counts. State holds one
    // key per event inside the watermark horizon only (the streaming
    // exact-dedup a training-data ingest needs).
    // North-star: APPEND-mode windowed aggregate with late-data DROP
    // discipline proven end-to-end. Four files through a
    // maxFilesPerTrigger=1 stream: the real events; a far-future flush
    // sentinel (2100); a SECOND sentinel; then the real events REPLAYED.
    // Two sentinels because Spark's stateful operators use TWO watermarks
    // per batch — late INPUT is filtered against the PREVIOUS trigger's
    // watermark while state EVICTION uses the current one (measured: with
    // one sentinel the replay batch still filtered at the pre-flush
    // watermark and double-counted the final window) — so the replay must
    // arrive two triggers after the flush to be fully dropped. The memory
    // table then holds exactly the original windowed counts (the sentinel
    // window never finalizes, so it never emits); any watermark-discipline
    // bug shows up as doubled counts or a phantom 2100 window. Scale:
    // append + watermark is THE unbounded-stream posture — state is the
    // open-window frontier only.
    "q_stream_late_drop" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_late_drop")
      val scratch = "/root/repo/target/scratch/late_drop_src"
      rmPath(scratch); new java.io.File(scratch).mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(s"$scratch/00_events.parquet"))
      val tsT = eventsTsType(s, d)
      writeSentinelFile(s, tsT, scratch, "01_flush", -1L)
      writeSentinelFile(s, tsT, scratch, "02_flush2", -2L)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(s"$scratch/03_late.parquet"))
      // the file source batches in MODIFICATION-TIME order and close
      // stamps can tie-break arbitrarily — minutes-apart explicit stamps
      // make the 00 → 01 → 02 → 03 sequence unambiguous
      Seq("00_events", "01_flush", "02_flush2", "03_late").zipWithIndex
        .foreach { case (n, i) =>
          new java.io.File(s"$scratch/$n.parquet")
            .setLastModified(1000000000000L + i * 60000L): Unit
        }

      val agg = s.readStream.schema(eventsRawSchema(tsT))
        .option("maxFilesPerTrigger", "1")
        .parquet(scratch)
        .withColumn("ts", normTs(col("ts"), tsT))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours").as("w"))
        .agg(count(lit(1)).as("cnt"))
      val q = agg.writeStream.format("memory").queryName("stream_late_drop")
        .outputMode("append")
        .option("checkpointLocation",
          "/root/repo/target/scratch/ckpt_stream_late_drop")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("stream_late_drop")
        .select(col("w.start").as("w_start"), col("cnt"))
        .orderBy("w_start")
    }},

    // SPARK-4 MULTI-STATEFUL PIPELINE: two chained event-time window
    // aggregations in ONE streaming query — hourly counts, then per-6h
    // window the peak and total hourly load — in append mode (chained
    // stateful operators cannot run complete). The second aggregate
    // groups on window_time() of the first's window column, the
    // supported chaining form. Three flush sentinels: watermark
    // advancement reaches operator k one committed micro-batch after
    // operator k-1 (the q_stream_late_drop two-watermark rule, once per
    // stateful operator), so level-2's windows need the third trigger to
    // flush. Sentinel rows live in a 2100 window that never closes and
    // so never appear in the output.
    "q_stream_chained" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_chained")
      val scratch = "/root/repo/target/scratch/chained_src"
      rmPath(scratch); new java.io.File(scratch).mkdirs()
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        java.nio.file.Paths.get(s"$scratch/00_events.parquet"))
      val tsT = eventsTsType(s, d)
      writeSentinelFile(s, tsT, scratch, "01_flush", -1L)
      writeSentinelFile(s, tsT, scratch, "02_flush", -2L)
      writeSentinelFile(s, tsT, scratch, "03_flush", -3L)
      Seq("00_events", "01_flush", "02_flush", "03_flush").zipWithIndex
        .foreach { case (n, i) =>
          new java.io.File(s"$scratch/$n.parquet")
            .setLastModified(1000000000000L + i * 60000L): Unit
        }
      val hourly = s.readStream.schema(eventsRawSchema(tsT))
        .option("maxFilesPerTrigger", "1")
        .parquet(scratch)
        .withColumn("ts", normTs(col("ts"), tsT))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w1"))
        .agg(count(lit(1)).as("cnt"))
      val rollup = hourly
        .groupBy(window(window_time(col("w1")), "6 hours").as("w"))
        .agg(max(col("cnt")).as("peak_hourly"), sum(col("cnt")).as("total"))
      val q = rollup.writeStream.format("memory").queryName("stream_chained")
        .outputMode("append")
        .option("checkpointLocation",
          "/root/repo/target/scratch/ckpt_stream_chained")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("stream_chained")
        .select(col("w.start").as("w_start"), col("peak_hourly"), col("total"))
        .orderBy("w_start")
    }},

    "q_stream_dedup" -> { (s, d) => withStatePartitions(s, 8) {
      cleanCheckpoint("stream_dedup")
      val doubled = eventsStream(s, d).unionByName(eventsStream(s, d))
      val agg = doubled
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      runToSnapshot(agg, "stream_dedup").orderBy("event_type")
    }},

    // North-star: sessionization — 30-min-gap sessions per user. Batch
    // path is the idiomatic lag+cumsum (one shuffle by user_id); the
    // streaming equivalent (session_window) is asserted equal in the
    // ScalaTest suite.
    "q_sessionize" -> { (s, d) =>
      // total order (ts, event_id) in lag + cumsum, mirrored in the
      // oracle — see withSessionNo's tie-frame note in Analytics
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      // second-truncated timestamps: keeps the gap arithmetic and the
      // session bounds integral on both engines (events.ts carries nanos)
      val evs = Tables.events(s, d)
        .withColumn("ts", date_trunc("second", col("ts")))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        // STRICT > gap: Spark's session_window merges ADJACENT windows —
        // an event exactly `gap` after the previous one lands at
        // prev.end == next.start and is absorbed into the SAME session
        // (verified empirically: sf0.1 user 511 has events 1800 s apart
        // and session_window(30 min) returns ONE 2-event session). The
        // r02/r03 `>=` reading ("half-open window ⇒ boundary starts a new
        // session") described the window extent, not the merge rule, and
        // only survived because sf0.01 has no exact-boundary gap.
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1)
            .otherwise(0))
        .withColumn("sess_no", sum(col("new_sess")).over(byUser))
      evs.groupBy("user_id", "sess_no")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
        .withColumn("sess_no", col("sess_no").cast("long"))
        .orderBy("user_id", "sess_no")
    }
  )

  /** Custom stateful streaming (brief: `KeyValueGroupedDataset.
    * flatMapGroupsWithState`): per-user cumulative event count + decimal
    * value total, state updated per micro-batch, update-mode emission.
    * State is one small record per user — bounded by user cardinality.
    * Equality with the batch aggregate is asserted in StreamingSpec.
    */
  case class UserAgg(user_id: Long, n_events: Long, total_cents: Long)

  /** The MODERN arbitrary-state API — `transformWithState` (Spark 4's
    * successor to flatMapGroupsWithState): typed `ValueState` handles
    * acquired in `init`, per-batch `handleInputRows`, RocksDB-backed
    * state store (the production-scale store — changelog checkpointing,
    * state larger than executor heap). Same per-user running-totals
    * semantics as [[runningUserTotals]] so the two APIs gate against the
    * SAME batch oracle: old and new state APIs proven equivalent.
    */
  class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), UserAgg] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[UserAgg] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      totals.update((n, cents))
      Iterator(UserAgg(uid, n, cents))
    }
  }

  /** MapState under transformWithState: per-type (user → count) as a
    * keyed MAP the store can update point-wise — RocksDB persists each
    * map entry as its own key, so an update touches one entry, not a
    * serialized blob (the scale win over the fMGWS whole-Map-value state
    * in [[streamingTopUsers]]). Same top-3 semantics and the same batch
    * oracle, so the three state APIs (fMGWS, ValueState, MapState) are
    * all proven equivalent.
    */
  class TypeTopUsersProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), TopUser] {
    import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var counts: MapState[Long, Long] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[Long, Long]("counts",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(etype: String, rows: Iterator[(String, Long)],
                                 timerValues: TimerValues): Iterator[TopUser] = {
      var n = if (seen.exists()) seen.get() else 0L
      rows.foreach { case (_, u) =>
        counts.updateValue(u,
          (if (counts.containsKey(u)) counts.getValue(u) else 0L) + 1L)
        n += 1
      }
      seen.update(n)
      counts.iterator().toSeq.sortBy { case (u, c) => (-c, u) }.take(k)
        .zipWithIndex.map { case ((u, c), i) =>
          TopUser(etype, i + 1L, u, c, n)
        }.iterator
    }
  }

  /** Output of the Misra-Gries streaming heavy hitter: as [[TopUser]] plus
    * the summary size, so callers (and the state-bound test) can observe
    * that state never exceeds `capacity` entries per type regardless of
    * user cardinality. The gated query projects the oracle columns only.
    */
  case class TopUserMg(event_type: String, rank: Long, user_id: Long,
                       cnt: Long, n_seen: Long, state_size: Long)

  /** The 100 TB streaming heavy-hitter path: per-type state is a
    * Misra-Gries summary at fixed `capacity`, NOT the full user→count map
    * ([[TypeTopUsersProcessor]]) — bounded state and a bounded per-batch
    * sort no matter how many distinct users a type sees.
    * [[graft.functions.MisraGries.reduce]] IS the per-row update function,
    * the same kernel the batch two-pass exact heavy hitters
    * ([[graft.operators.Sketches.heavyHitters]]) use for their candidate
    * pass.
    *
    * Retained counts are lower bounds; they are EXACT whenever the
    * summary never evicted (distinct users per type ≤ capacity) — the
    * gated query runs at capacity 512 over sf0.01's 150 users/type, so
    * its emissions provably equal the exact top-k and the batch oracle
    * applies. At bench sf0.1 (1500 users/type) the eviction path runs for
    * real with state capped at 512 entries.
    */
  /** MG summary in state-encodable form: the state store's value encoder
    * supports arrays but not MapType, so the (user → count) summary rides
    * as parallel arrays (≤ capacity entries) and is rebuilt as a Map at
    * batch boundaries — an O(capacity) conversion per type per batch.
    */
  case class MgSummaryState(users: Seq[Long], counts: Seq[Long], n_seen: Long)

  class MgTopUsersProcessor(k: Int, capacity: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Long), TopUserMg] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var summary: ValueState[MgSummaryState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      summary = getHandle.getValueState[MgSummaryState]("mg",
        org.apache.spark.sql.Encoders.product[MgSummaryState], TTLConfig.NONE)

    override def handleInputRows(etype: String, rows: Iterator[(String, Long)],
                                 timerValues: TimerValues): Iterator[TopUserMg] = {
      val prev = if (summary.exists()) summary.get() else MgSummaryState(Nil, Nil, 0L)
      var buf = prev.users.iterator.zip(prev.counts.iterator).toMap
      var n = prev.n_seen
      rows.foreach { case (_, u) =>
        buf = graft.functions.MisraGries.reduce(buf, u, capacity)
        n += 1
      }
      val entries = buf.toSeq
      summary.update(MgSummaryState(entries.map(_._1), entries.map(_._2), n))
      entries.sortBy { case (u, c) => (-c, u) }.take(k)
        .zipWithIndex.map { case ((u, c), i) =>
          TopUserMg(etype, i + 1L, u, c, n, buf.size.toLong)
        }.iterator
    }
  }

  /** KLL quantile sketch as STREAMING STATE — the third bounded-state
    * sketch in the store (HLL registers: q_stream_srm_hll / q_stream_hll_
    * users; Misra-Gries: q_stream_top_users_mg; quantiles: this). State
    * per type is the compactor hierarchy, O(k·log(n/k)) doubles no matter
    * how many values stream through — the live-median/latency-dashboard
    * primitive. The state-store value encoder gets the levels FLATTENED
    * to (lens, vals) parallel arrays (the MgSummaryState trick — no
    * nested containers in state), rebuilt per type per batch in
    * O(state).
    */
  case class KllMedianSnap(event_type: String, n_seen: Long, est_p50: Double)
  case class KllStreamState(lens: Seq[Int], vals: Seq[Double], n_seen: Long)

  class TypeKllProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Double), KllMedianSnap] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var sk: ValueState[KllStreamState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sk = getHandle.getValueState[KllStreamState]("kll",
        org.apache.spark.sql.Encoders.product[KllStreamState], TTLConfig.NONE)

    override def handleInputRows(etype: String, rows: Iterator[(String, Double)],
                                 timerValues: TimerValues): Iterator[KllMedianSnap] = {
      val prev =
        if (sk.exists()) sk.get() else KllStreamState(Seq(0), Nil, 0L)
      var st: graft.functions.Kll.State = {
        val b = Vector.newBuilder[Vector[Double]]
        var off = 0
        prev.lens.foreach { l =>
          b += prev.vals.slice(off, off + l).toVector; off += l
        }
        val v = b.result()
        if (v.isEmpty) graft.functions.Kll.empty else v
      }
      var n = prev.n_seen
      rows.foreach { case (_, v) =>
        st = graft.functions.Kll.insert(st, v, k); n += 1
      }
      sk.update(KllStreamState(st.map(_.length), st.flatten, n))
      Iterator(KllMedianSnap(etype, n, graft.functions.Kll.quantile(st, 0.5)))
    }
  }

  def streamingKllMedian(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         k: Int): org.apache.spark.sql.Dataset[KllMedianSnap] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .transformWithState(new TypeKllProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  def streamingTopUsersMg(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                          k: Int, capacity: Int): org.apache.spark.sql.Dataset[TopUserMg] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.select(col("event_type"), col("user_id")).as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new MgTopUsersProcessor(k, capacity),
        TimeMode.None(), OutputMode.Update())
  }

  def streamingTopUsersTws(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                           k: Int): org.apache.spark.sql.Dataset[TopUser] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.select(col("event_type"), col("user_id")).as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new TypeTopUsersProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  def runningUserTotalsTws(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming heavy hitters: per event_type, per-user counts held in
    * arbitrary state; each update emits that type's current top-3 (count
    * DESC, user ASC). The streaming twin of the batch custom top-k
    * operator ([[graft.plans.TopKPerKey]]) and of the two-pass exact
    * heavy hitters ([[graft.operators.Sketches.heavyHitters]]).
    *
    * State per group = one (user → count) map + a monotone processed
    * counter, bounded by per-type user cardinality; on an unbounded key
    * space the same state slot holds the Misra-Gries summary
    * (MisraGriesAggregator.reduce IS the update function) at fixed size —
    * documented as the 100 TB path, exact variant gated here.
    * `n_seen` makes the final emission per (type, rank) selectable by a
    * max-struct — no reliance on sink arrival order.
    */
  case class TypeTopState(counts: Map[Long, Long], n_seen: Long)
  case class TopUser(event_type: String, rank: Long, user_id: Long,
                     cnt: Long, n_seen: Long)

  def streamingTopUsers(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                        k: Int): org.apache.spark.sql.Dataset[TopUser] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("event_type"), col("user_id")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TypeTopState, TopUser](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[(String, Long)], state: GroupState[TypeTopState]) =>
          val prev = state.getOption.getOrElse(TypeTopState(Map.empty, 0L))
          var m = prev.counts; var n = prev.n_seen
          rows.foreach { case (_, u) =>
            m = m.updated(u, m.getOrElse(u, 0L) + 1L); n += 1
          }
          state.update(TypeTopState(m, n))
          m.toSeq.sortBy { case (u, c) => (-c, u) }.take(k)
            .zipWithIndex.map { case ((u, c), i) =>
              TopUser(etype, i + 1L, u, c, n)
            }.iterator
      }
  }

  def runningUserTotals(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // exact decimal→cents (not round(double*100)): bit-stable across
    // engines, so the oracle can re-derive the same integers
    events.select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0L))
          var n = prev.n_events; var cents = prev.total_cents
          rows.foreach { case (_, c) => n += 1; cents += c }
          val next = UserAgg(uid, n, cents)
          state.update(next)
          Iterator(next)
      }
  }

  def oracles: Map[String, String] = Map(
    // stream ≡ batch ≡ DuckDB: the md5 CMS is deterministic, so the
    // oracle replays the whole sketch over events/user_id exactly
    "q_stream_countmin" ->
      """WITH exact AS (
        | SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY 1),
        |rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
        |cells AS (
        | SELECT r,
        |  CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
        |    CAST(key AS VARCHAR)), 1, 8)) AS BIGINT) % 512 AS bucket,
        |  CAST(sum(cnt) AS BIGINT) AS cell
        | FROM exact, rs GROUP BY 1, 2),
        |top AS (SELECT key, cnt FROM exact ORDER BY cnt DESC, key
        |  LIMIT 10),
        |probes AS (
        | SELECT key, cnt, r,
        |  CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
        |    CAST(key AS VARCHAR)), 1, 8)) AS BIGINT) % 512 AS bucket
        | FROM top, rs)
        |SELECT p.key AS key, CAST(p.cnt AS BIGINT) AS exact_cnt,
        | CAST(min(c.cell) AS BIGINT) AS cms_est,
        | CAST(min(c.cell) - p.cnt AS BIGINT) AS overestimate
        |FROM probes p JOIN cells c USING (r, bucket)
        |GROUP BY p.key, p.cnt ORDER BY exact_cnt DESC, key""".stripMargin,
    // stream ≡ batch: the live posterior must equal the at-rest readout
    "q_stream_bayes_ab" -> graft.operators.Analytics.oracles("q_bayes_ab"),
    // stream ≡ batch: the identical CUSUM fold over events at rest
    // (the q_cusum recursive-CTE twin, day series = event value cents)
    "q_stream_cusum" ->
      """WITH RECURSIVE d AS (
        | SELECT CAST(ts AS DATE) AS day,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS rc
        | FROM events WHERE value IS NOT NULL GROUP BY 1),
        |i AS (SELECT rc, row_number() OVER (ORDER BY day) AS rn FROM d),
        |m AS (
        | SELECT count(*) AS n, CAST(sum(rc) AS BIGINT) AS sc,
        |  CAST(sum(rc) AS BIGINT) // count(*) AS mu,
        |  CAST(floor(sqrt((CAST(sum(CAST(rc AS HUGEINT) * rc) AS DOUBLE)
        |    - CAST(CAST(sum(rc) AS BIGINT) AS DOUBLE) * CAST(CAST(sum(rc) AS BIGINT) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE)) / 2.0)
        |   AS BIGINT) AS kc,
        |  CAST(floor(sqrt((CAST(sum(CAST(rc AS HUGEINT) * rc) AS DOUBLE)
        |    - CAST(CAST(sum(rc) AS BIGINT) AS DOUBLE) * CAST(CAST(sum(rc) AS BIGINT) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE)) / CAST(count(*) AS DOUBLE)) * 4.0)
        |   AS BIGINT) AS hc
        | FROM d),
        |f AS (
        | SELECT 0 AS rn, CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sn,
        |  CAST(0 AS BIGINT) AS al, CAST(0 AS BIGINT) AS msp,
        |  CAST(0 AS BIGINT) AS msn
        | UNION ALL
        | SELECT i.rn,
        |  CASE WHEN greatest(0, f.sp + (i.rc - m.mu) - m.kc) > m.hc THEN 0
        |       ELSE greatest(0, f.sp + (i.rc - m.mu) - m.kc) END,
        |  CASE WHEN greatest(0, f.sn + (m.mu - i.rc) - m.kc) > m.hc THEN 0
        |       ELSE greatest(0, f.sn + (m.mu - i.rc) - m.kc) END,
        |  f.al + (CASE WHEN greatest(0, f.sp + (i.rc - m.mu) - m.kc) > m.hc
        |            OR greatest(0, f.sn + (m.mu - i.rc) - m.kc) > m.hc
        |          THEN 1 ELSE 0 END),
        |  greatest(f.msp, greatest(0, f.sp + (i.rc - m.mu) - m.kc)),
        |  greatest(f.msn, greatest(0, f.sn + (m.mu - i.rc) - m.kc))
        | FROM f JOIN i ON i.rn = f.rn + 1 CROSS JOIN m)
        |SELECT (SELECT n FROM m) AS n_days, (SELECT kc FROM m) AS k_cents,
        | (SELECT hc FROM m) AS h_cents, al AS n_alarms,
        | msp AS max_sp, msn AS max_sn
        |FROM f ORDER BY rn DESC LIMIT 1""".stripMargin,
    // stream ≡ batch cumulative: q_msprt's final counts + llr (the
    // path-dependent `crossed` flag is batch-only by construction)
    "q_stream_msprt" ->
      """WITH pu AS (
        | SELECT user_id,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |   1, 4)) AS BIGINT) % 2 = 0 THEN 'c' ELSE 't' END AS arm,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        | FROM events GROUP BY 1, 2),
        |piv AS (
        | SELECT
        |  CAST(sum(CASE WHEN arm = 'c' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_c,
        |  CAST(sum(CASE WHEN arm = 'c' THEN conv ELSE 0 END) AS BIGINT)
        |   AS x_c,
        |  CAST(sum(CASE WHEN arm = 't' THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_t,
        |  CAST(sum(CASE WHEN arm = 't' THEN conv ELSE 0 END) AS BIGINT)
        |   AS x_t
        | FROM pu),
        |stat AS (
        | SELECT n_c, x_c, n_t, x_t,
        |  CAST(x_c + x_t AS DOUBLE)
        |   / (CAST(n_c AS DOUBLE) + CAST(n_t AS DOUBLE)) AS p,
        |  CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |   - CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS dlt
        | FROM piv),
        |s2t AS (
        | SELECT n_c, x_c, n_t, x_t, dlt,
        |  p * (1.0 - p) * (1.0 / CAST(n_c AS DOUBLE)
        |                   + 1.0 / CAST(n_t AS DOUBLE)) AS s2
        | FROM stat),
        |lt AS (
        | SELECT n_c, x_c, n_t, x_t, s2,
        |  CASE WHEN s2 > 0 THEN
        |   0.5 * ln(s2 / (s2 + 0.01 * 0.01)) + dlt * dlt * (0.01 * 0.01)
        |    / (2.0 * s2 * (s2 + 0.01 * 0.01)) END AS llr
        | FROM s2t)
        |SELECT n_c, x_c, n_t, x_t,
        | CASE WHEN s2 > 0 THEN round(llr, 6) END AS llr,
        | CASE WHEN s2 > 0 THEN llr >= ln(1.0 / 0.05)
        |  ELSE false END AS sig_now
        |FROM lt""".stripMargin,
    // stream ≡ batch on the bounded source: the batch PSI twin verbatim
    "q_stream_psi" -> graft.operators.Evolution.oracles("q_psi_drift"),
    // stream ≡ batch: the batch SRM twin verbatim
    "q_stream_srm" -> graft.operators.Analytics.oracles("q_srm_check"),
    // per-type exact median + the pinned rank contract (the stream's KLL
    // state is gated by its order-independent guarantee, not replayed)
    "q_stream_kll_median" ->
      """SELECT event_type AS grp,
        | quantile_cont(CAST(value AS DOUBLE), 0.5) AS exact_p50,
        | TRUE AS within_tol
        |FROM events GROUP BY 1 ORDER BY grp""".stripMargin,
    // the exact readout twin + the two pinned sketch contracts (no
    // stripMargin on the outer template: the inner SQL is pre-stripped)
    "q_stream_srm_hll" ->
      ("SELECT na, nb, chi2, srm_detected, " +
        "TRUE AS stream_eq_batch_sketch, TRUE AS within_tol FROM (\n" +
        graft.operators.Analytics.oracles("q_srm_check") + "\n)"),
    "q_stream_hourly" ->
      "SELECT CAST(hour(ts) AS INTEGER) AS h, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "q_stream_windowed" ->
      """SELECT make_timestamp(CAST(floor(epoch(ts)/21600)*21600*1000000 AS BIGINT)) AS w_start,
        | count(*) AS cnt,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_hll_users" ->
      """SELECT make_timestamp(CAST(floor(epoch(ts)/21600)*21600*1000000 AS BIGINT)) AS w_start,
        | count(DISTINCT user_id) AS exact_users, TRUE AS within_tol
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_chained" ->
      """WITH h AS (
        | SELECT make_timestamp(CAST(floor(epoch(ts)/3600)*3600*1000000 AS BIGINT)) AS h_start,
        |  count(*) AS cnt
        | FROM events GROUP BY 1)
        |SELECT make_timestamp(CAST(floor(epoch(h_start)/21600)*21600*1000000 AS BIGINT)) AS w_start,
        | max(cnt) AS peak_hourly, CAST(sum(cnt) AS BIGINT) AS total
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_sliding" ->
      """WITH w AS (
        | SELECT unnest([
        |   CAST(floor(epoch(ts)/10800)*10800 AS BIGINT),
        |   CAST(floor(epoch(ts)/10800)*10800 - 10800 AS BIGINT)]) AS start_s
        | FROM events)
        |SELECT make_timestamp(start_s*1000000) AS w_start, count(*) AS cnt
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_session" ->
      """WITH e AS (SELECT user_id, event_id,
        |  date_trunc('second', ts) AS ts FROM events),
        |g AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |       THEN 1 ELSE 0 END AS new_sess
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, ts,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
        | FROM g)
        |SELECT user_id, min(ts) AS sess_start, count(*) AS n_events
        |FROM s GROUP BY user_id, sess_no ORDER BY user_id, sess_start""".stripMargin,
    // upsert store ≡ last event per user over the whole table
    // stream ≡ batch: the q_cdc_merge oracle verbatim (same changelog)
    "q_stream_cdc_apply" -> graft.operators.Scd.oracles("q_cdc_merge"),
    "q_stream_upsert" ->
      """SELECT user_id, event_type AS last_type, value AS last_value
        |FROM (SELECT user_id, event_type, value,
        |       row_number() OVER (PARTITION BY user_id
        |                          ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_stream_dedup" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    // replayed-late rows dropped, sentinel window never finalized: the
    // append-mode emission equals the plain batch windowed count
    "q_stream_late_drop" ->
      """SELECT make_timestamp(CAST(floor(epoch(ts)/21600)*21600*1000000 AS BIGINT)) AS w_start,
        | count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_json_envelope" ->
      """SELECT event_type, count(*) AS cnt,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the list envelope is a lossless re-batching: decode(encode(rows))
    // must re-aggregate to the plain per-type totals
    "q_stream_list_envelope" ->
      """SELECT event_type, count(*) AS cnt,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_crossings" ->
      """SELECT event_type AS crossing_type, count(*) AS crossings,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS lesions_total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_enriched" ->
      """SELECT COALESCE(n_name, 'unknown') AS region, count(*) AS cnt
        |FROM events LEFT JOIN nation ON CAST(user_id % 25 AS INTEGER) = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_topic_sink" ->
      "SELECT CAST(hour(ts) AS INTEGER) AS h, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "q_stream_interval_join" ->
      """SELECT CAST(hour(l.ts) AS INTEGER) AS h, count(*) AS pairs
        |FROM events l JOIN events r
        | ON l.user_id = r.user_id
        | AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_state_totals" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS total_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_tws_totals" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS total_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_stream_top_users_tws" ->
      """SELECT event_type, CAST(rn AS BIGINT) AS rank, user_id, c AS cnt
        |FROM (
        | SELECT event_type, user_id, count(*) AS c,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY count(*) DESC, user_id) AS rn
        | FROM events GROUP BY event_type, user_id)
        |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin,
    "q_stream_top_users" ->
      """SELECT event_type, CAST(rn AS BIGINT) AS rank, user_id, c AS cnt
        |FROM (
        | SELECT event_type, user_id, count(*) AS c,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY count(*) DESC, user_id) AS rn
        | FROM events GROUP BY event_type, user_id)
        |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin,
    "q_stream_state_reader" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        | count(*) AS n_seen
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact-by-the-bound at gate scale (no eviction at capacity 512), so
    // the same batch top-k oracle applies
    "q_stream_top_users_mg" ->
      """SELECT event_type, CAST(rn AS BIGINT) AS rank, user_id, c AS cnt
        |FROM (
        | SELECT event_type, user_id, count(*) AS c,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY count(*) DESC, user_id) AS rn
        | FROM events GROUP BY event_type, user_id)
        |WHERE rn <= 3 ORDER BY event_type, rank""".stripMargin,
    "q_stream_left_join" ->
      """SELECT CAST(hour(l.ts) AS INTEGER) AS h, count(*) AS total,
        | count(r.event_id) AS matched
        |FROM events l LEFT JOIN events r
        | ON l.user_id = r.user_id
        | AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |  date_trunc('second', ts) AS ts FROM events),
        |g AS (
        | SELECT user_id, event_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
        |       THEN 1 ELSE 0 END AS new_sess
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        | SELECT user_id, ts,
        |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
        | FROM g)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no, count(*) AS n_events,
        | min(ts) AS sess_start, max(ts) AS sess_end
        |FROM s GROUP BY 1,2 ORDER BY 1,2""".stripMargin
  )
}
