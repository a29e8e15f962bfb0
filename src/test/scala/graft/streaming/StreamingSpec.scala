package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.core.{EngineConfig, Strategy}
import graft.produce.Emitter
import graft.route.RouteRegistry
import graft.testkit.TestHarness

/** Structured Streaming behavior: the router over a real (memory) stream,
  * event-time windows + watermark, session windows, stateful dedup — the
  * engine's streaming core (SURVEY.md §2.2 streaming rows). */
class StreamingSpec extends SparkSuite {

  test("router over a MemoryStream: micro-batches route and capture emits") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val h = new TestHarness(spark, EngineConfig(groupId = Some("g")))
    val counts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    h.consumer.add("clicks", "click", (df, _) =>
      counts.synchronized { counts("click") += df.count() })
    h.consumer.add("clicks", (df, _) =>
      counts.synchronized { counts("all") += df.count() })

    val mem = MemoryStream[(String, String)]
    mem.addData(
      ("clicks", """{"code":"Click","n":1}"""),
      ("clicks", """{"code":"View","n":2}"""),
      ("clicks", """not json"""))
    val q = h.consumer.start(mem.toDF().toDF("topic", "value"),
      trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    assert(counts("click") == 1)   // only the Click event
    assert(counts("all") == 2)     // both valid events; malformed dropped
    h.consumer.stop()
  }

  test("streaming windowed aggregation with watermark over the events table") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    def t(m: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $m:00")
    mem.addData(
      (t("00:01"), "click", 1.0), (t("00:02"), "click", 2.0),
      (t("00:07"), "click", 5.0), (t("00:03"), "view", 1.0))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .selectExpr("window.start AS ws", "event_type", "n", "v")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(rows == Set(
      ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
      ("2024-01-01 00:05:00.0", "click", 1L, 5.0),
      ("2024-01-01 00:00:00.0", "view", 1L, 1.0)))
    q.stop()
  }

  test("streaming session windows (30-min gap)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    mem.addData(
      (t("00:00:00"), 1L), (t("00:10:00"), 1L),  // session 1
      (t("01:00:00"), 1L),                        // gap > 30m → session 2
      (t("00:05:00"), 2L))
    q.processAllAvailable()
    val rows = spark.table("sess_out")
      .selectExpr("user_id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(rows == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    q.stop()
  }

  test("stateful streaming dedup: dropDuplicatesWithinWatermark on event_id") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val dedup = mem.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    mem.addData((t("00:00:00"), 1L), (t("00:01:00"), 1L), (t("00:02:00"), 2L))
    q.processAllAvailable()
    mem.addData((t("00:03:00"), 2L), (t("00:04:00"), 3L))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("backpressure admission bounds (O12/O13): maxOffsets per strategy") {
    val em = new Emitter(EngineConfig())
    def router(cfg: EngineConfig): RouteRegistry = {
      val r = new RouteRegistry(cfg, em)
      r.add("topic-a", (_: DataFrame, _: Emitter) => ())
      r.add("topic-b", (_: DataFrame, _: Emitter) => ())
      r.add("topic-b", "e", (_: DataFrame, _: Emitter) => ())  // dup topic
      r
    }
    // default cap 20 × 2 distinct topics
    assert(KafkaBridge.maxOffsets(EngineConfig(), router(EngineConfig())) == 40L)
    // per-topic override + unlimited: unlimited is clamped (a single global
    // bound must not be erased by one unlimited topic)
    val cfg = EngineConfig(perTopicCaps = Map("topic-a" -> Some(5), "topic-b" -> None))
    assert(KafkaBridge.maxOffsets(cfg, router(cfg))
      == 5L + KafkaBridge.UnlimitedShareFactor * 20L)
    // one-by-one → strict serialization
    val one = EngineConfig(strategy = Strategy.OneByOne)
    assert(KafkaBridge.maxOffsets(one, router(one)) == 1L)
    // exact per-topic admission: one plan per topic, None = truly unbounded
    assert(KafkaBridge.perTopicPlans(cfg, router(cfg))
      == Map("topic-a" -> Some(5L), "topic-b" -> None))
  }

  test("kafka option-map contract (O1/O2/O18): exact reader/writer options per config") {
    val em = new Emitter(EngineConfig())
    def router(cfg: EngineConfig): RouteRegistry = {
      val r = new RouteRegistry(cfg, em)
      r.add("topic-a", (_: DataFrame, _: Emitter) => ())
      r.add("topic-b", (_: DataFrame, _: Emitter) => ())
      r.add("topic-b", "e", (_: DataFrame, _: Emitter) => ())  // dup topic collapses
      r
    }
    // golden reader map, defaults: deduped subscribe set, latest offsets,
    // failOnDataLoss=false without a checkpoint, cap = 20 x 2 topics, no
    // optional keys
    val base = EngineConfig(host = "broker:9092")
    assert(KafkaBridge.sourceOptions(base, router(base)) == Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "topic-a,topic-b",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "40"))
    // everything on: groupId + minPartitions appear, a checkpoint flips
    // failOnDataLoss, per-topic caps feed the trigger arithmetic with the
    // unlimited topic clamped to UnlimitedShareFactor x default cap
    val full = EngineConfig(
      host = "b1:9092",
      groupId = Some("grp"),
      startingOffsets = "earliest",
      checkpointLocation = Some("/tmp/ck"),
      perTopicCaps = Map("topic-a" -> Some(5), "topic-b" -> None))
    assert(KafkaBridge.sourceOptions(full, router(full), minPartitions = Some(64)) == Map(
      "kafka.bootstrap.servers" -> "b1:9092",
      "subscribe" -> "topic-a,topic-b",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "true",
      "maxOffsetsPerTrigger" -> (5L + KafkaBridge.UnlimitedShareFactor * 20L).toString,
      "kafka.group.id" -> "grp",
      "minPartitions" -> "64"))
    // one-by-one strategy serializes through the same map
    val one = EngineConfig(strategy = Strategy.OneByOne)
    assert(KafkaBridge.sourceOptions(one, router(one))("maxOffsetsPerTrigger") == "1")
    // golden writer map: bare by default; all four O18 producer knobs —
    // compression, idempotence, retries, partitioner class (reference
    // legacy-producer.ts:100,106) — pass through under kafka.* producer keys
    assert(KafkaBridge.sinkOptions(EngineConfig(), "h:9092")
      == Map("kafka.bootstrap.servers" -> "h:9092"))
    assert(KafkaBridge.sinkOptions(
      EngineConfig(
        compression = Some("zstd"),
        idempotent = true,
        retries = Some(5),
        partitionerClass = Some("org.example.RoundRobinPartitioner")), "h:9092") == Map(
      "kafka.bootstrap.servers" -> "h:9092",
      "kafka.compression.type" -> "zstd",
      "kafka.enable.idempotence" -> "true",
      "kafka.retries" -> "5",
      "kafka.partitioner.class" -> "org.example.RoundRobinPartitioner"))
  }

  test("one-by-one strategy processes messages individually and in order") {
    val schemas = new graft.core.EventSchemaRegistry().register("T",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.LongType))))
    val h = new TestHarness(spark, EngineConfig(strategy = Strategy.OneByOne), schemas = schemas)
    val seen = mutable.Buffer.empty[Long]
    h.consumer.add("t", (df, _) => {
      val ids = df.select("i").collect().map(_.getLong(0))
      assert(ids.length <= 1, "one message per dispatch")
      seen ++= ids
      ()
    })
    import spark.implicits._
    val batch = (1L to 5L).map(i => ("t", s"""{"code":"T","i":$i}""")).toDF("topic", "value")
    h.consumer.process(batch)
    assert(seen.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("stream-static broadcast join: event enrichment against a dimension") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Double)]
    val joined = mem.toDF().toDF("user_id", "value")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    mem.addData((1L, 10.0), (2L, 5.0), (3L, 1.0))
    q.processAllAvailable()
    val rows = spark.table("enrich_out")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSet
    assert(rows == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
    q.stop()
  }

  test("custom stateful operator: per-user running count via mapGroupsWithState") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val mem = MemoryStream[(Long, String)]
    val counted = mem.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, String)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + events.size
          state.update(n)
          (user, n)
      }
    val q = counted.toDF("user_id", "n").writeStream.outputMode("update")
      .format("memory").queryName("state_out").start()
    mem.addData((1L, "a"), (1L, "b"), (2L, "c"))
    q.processAllAvailable()
    mem.addData((1L, "d"))
    q.processAllAvailable()
    val latest = spark.table("state_out")
      .groupBy($"user_id").agg(max($"n").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(latest == Set((1L, 3L), (2L, 1L)))
    q.stop()
  }

  test("checkpoint restart: committed micro-batches are not reprocessed") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val seen = new java.util.concurrent.atomic.AtomicLong
    def harness(): TestHarness = {
      val h = new TestHarness(spark,
        EngineConfig(groupId = Some("g"), checkpointLocation = Some(ckpt)))
      h.consumer.add("t", (df, _) => { seen.addAndGet(df.count()); () })
      h
    }
    val mem = MemoryStream[(String, String)]
    mem.addData(("t", """{"code":"T","i":1}"""), ("t", """{"code":"T","i":2}"""))
    val q1 = harness().consumer.start(mem.toDF().toDF("topic", "value"),
      trigger = Trigger.AvailableNow(), queryName = "ckpt-1")
    q1.awaitTermination(60000)
    assert(seen.get() == 2)
    // restart against the same checkpoint: only the new offsets replay
    mem.addData(("t", """{"code":"T","i":3}"""))
    val q2 = harness().consumer.start(mem.toDF().toDF("topic", "value"),
      trigger = Trigger.AvailableNow(), queryName = "ckpt-2")
    q2.awaitTermination(60000)
    assert(seen.get() == 3, "batch 1 must not be reprocessed after restart")
  }

  test("transformWithState: per-key running stats with RocksDB state store") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double)]
      val out = mem.toDS()
        .groupByKey(_._1)
        .transformWithState(new StatefulOps.RunningStatsProcessor(),
          TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user_id", "n", "total").writeStream.outputMode("update")
        .format("memory").queryName("tws_out").start()
      mem.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
      q.processAllAvailable()
      mem.addData((1L, 5.0))
      q.processAllAvailable()
      val latest = spark.table("tws_out")
        .groupBy($"user_id").agg(max($"n").as("n"), max($"total").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest == Set((1L, 3L, 10.0), (2L, 1L, 10.0)))
      q.stop()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming MinHash dedup: near-identical docs collapse within the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val deduped = StatefulOps.StreamingDedup.bySignature(
      mem.toDF().toDF("ts", "doc_id", "text"), "ts", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    mem.addData(
      (t("00:00:00"), 1L, text),
      (t("00:01:00"), 2L, text),                                  // exact dup -> dropped
      (t("00:02:00"), 3L, "completely different words in this tiny document here"))
    q.processAllAvailable()
    val ids = spark.table("sdedup_out").select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 3L))
    q.stop()
  }

  test("emitStream in onlyTesting captures per micro-batch instead of touching Kafka") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val em = new Emitter(EngineConfig(appName = Some("s"), onlyTesting = true))
    val mem = MemoryStream[(String, Long)]
    mem.addData(("a", 1L), ("b", 2L))
    val q = em.emitStream(mem.toDF().toDF("name", "n"), "out-topic", Some("ev"),
      checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-es").toString))
    q.processAllAvailable()
    q.stop()
    val got = em.getEmittedEvents
    assert(got.map(_.topic).distinct == Seq("out-topic"))
    assert(got.flatMap(_.values).size == 2)
    assert(got.flatMap(_.values).forall(_.contains(""""code":"Ev"""")))
  }

  test("multi-host streaming emit is the capture twin of multi-host batch emit") {
    // O3 replication with onlyTesting: regardless of how many hosts are
    // configured, the capture sink records each message ONCE (the host
    // fan-out is a write-side concern), and the streaming path produces
    // byte-identical payloads to the batch path for the same rows.
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val cfg = EngineConfig(appName = Some("s"), onlyTesting = true,
      additionalHosts = Seq("h2:9092", "h3:9092"))
    val clock = fixedClock("2022-12-08T00:00:00Z")
    val rows = Seq(("a", 1L), ("b", 2L))

    val batchEm = new Emitter(cfg, clock)
    batchEm.emit(rows.toDF("name", "n"), "out-topic", Some("ev"))

    val streamEm = new Emitter(cfg, clock)
    val mem = MemoryStream[(String, Long)]
    mem.addData(rows: _*)
    val q = streamEm.emitStream(mem.toDF().toDF("name", "n"), "out-topic", Some("ev"),
      checkpoint = Some(java.nio.file.Files.createTempDirectory("graft-es-mh").toString))
    q.processAllAvailable()
    q.stop()

    val batchVals = batchEm.getEmittedEvents.flatMap(_.values).sorted
    val streamVals = streamEm.getEmittedEvents.flatMap(_.values).sorted
    assert(batchVals.size == 2, "3 hosts must not triple the capture")
    assert(streamVals == batchVals)
  }

  test("default-clock enrichment stamps per batch (current_timestamp in plan, not a literal)") {
    import spark.implicits._
    val em = new Emitter(EngineConfig(appName = Some("s")))
    val plan = em.enrich(Seq(Tuple1("x")).toDF("p"), "t")
      .queryExecution.analyzed.toString
    assert(plan.contains("current_timestamp"), s"expected live timestamp, got:\n$plan")
    // injected clock -> frozen literal, no current_timestamp
    val fixed = new Emitter(EngineConfig(appName = Some("s")),
      fixedClock("2022-12-08T00:00:00Z"))
    val plan2 = fixed.enrich(Seq(Tuple1("x")).toDF("p"), "t")
      .queryExecution.analyzed.toString
    assert(!plan2.contains("current_timestamp"))
  }

  test("streaming dedup: short documents fall back to exact signature, never vanish") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val deduped = StatefulOps.StreamingDedup.bySignature(
      mem.toDF().toDF("ts", "doc_id", "text"), "ts", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sdedup_short").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    mem.addData(
      (t("00:00:00"), 1L, "hello world"),     // < 3 tokens: exact fallback
      (t("00:01:00"), 2L, "hello world"),     // identical short doc -> dropped
      (t("00:02:00"), 3L, "bye"))
    q.processAllAvailable()
    val ids = spark.table("sdedup_short").select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(ids == Seq(1L, 3L))
    q.stop()
  }

  test("one-by-one strategy routes malformed values to the DLQ too") {
    val h = new TestHarness(spark,
      EngineConfig(strategy = Strategy.OneByOne, dlqTopic = Some("dlq")))
    var good = 0L
    h.consumer.add("t", (df, _) => { good += df.count() })
    h.inputRaw("t", """{"a":1}""")
    h.inputRaw("t", "garbage {{{")
    assert(good == 1)
    assert(h.emitter.getEmittedEvents.filter(_.topic == "dlq")
      .flatMap(_.values) == Seq("garbage {{{"))
  }

  test("stream-stream join with watermarks and a time-bound condition") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val buys = MemoryStream[(java.sql.Timestamp, Long)]
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val c = clicks.toDF().toDF("click_ts", "user_id").withWatermark("click_ts", "1 hour")
    val b = buys.toDF().toDF("buy_ts", "buy_user").withWatermark("buy_ts", "1 hour")
    // attribute a purchase to a click by the same user within 30 minutes
    val joined = c.join(b,
      expr("""user_id = buy_user AND
             |buy_ts >= click_ts AND buy_ts <= click_ts + INTERVAL 30 MINUTES""".stripMargin))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    clicks.addData((t("00:00:00"), 1L), (t("00:00:00"), 2L), (t("02:00:00"), 3L))
    buys.addData((t("00:10:00"), 1L),   // within 30m of click -> attributed
                 (t("01:30:00"), 2L),   // 90m later -> NOT attributed
                 (t("02:05:00"), 3L))   // within 30m -> attributed
    q.processAllAvailable()
    val users = spark.table("ssj_out").select("user_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(users == Seq(1L, 3L))
    q.stop()
  }
}
