package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{EngineConfig, Strategy}
import graft.route.RouteRegistry

/** Kafka source/sink wiring (reference O1, O2, O12, O18 — SURVEY.md §2.1).
  *
  * The reference subscribes one kafkajs consumer to the deduped topic set
  * and hand-rolls pause/resume backpressure; on Spark both are declarative:
  *  - source pruning = `subscribe` only the routed topics;
  *  - admission control = `maxOffsetsPerTrigger` (+ micro-batch barrier);
  *  - `minPartitions` splits hot topic-partitions across executors — at
  *    100 TB/day the consumer parallelism is `max(kafka partitions,
  *    minPartitions)`, not one event loop.
  *
  * Producer tuning passthrough (O18): compression, idempotence, retries map
  * 1:1 onto `kafka.*` options; connection pooling + TTL (O17) is the
  * connector's producer cache.
  *
  * Untestable in this environment (no broker, no kafka connector jar) —
  * exercised through the memory source/sink twins in the testkit, which is
  * exactly the reference's own `onlyTesting` philosophy.
  */
object KafkaBridge {

  /** Streaming envelope source for a router: subscribes the deduped routed
    * topic set, yields `(topic, value)` rows. */
  def source(
      spark: SparkSession,
      config: EngineConfig,
      router: RouteRegistry,
      minPartitions: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", config.host)
      .option("subscribe", router.topics.mkString(","))
      .option("startingOffsets", config.startingOffsets)
      .option("failOnDataLoss", config.resolveFailOnDataLoss.toString)
      .option("maxOffsetsPerTrigger", maxOffsets(config, router).toString)
    config.groupId.foreach(g => reader.option("kafka.group.id", g))
    minPartitions.foreach(p => reader.option("minPartitions", p.toString))
    reader.load()
      .select(col("topic"), col("value").cast("string").as("value"))
  }

  /** How much an "unlimited" topic contributes to the shared micro-batch
    * bound: large relative to any cap, but finite — one unlimited topic
    * must not erase every other topic's admission control (the bound is a
    * single global knob; true per-topic isolation = [[perTopicPlans]]). */
  val UnlimitedShareFactor = 100L

  /** Micro-batch admission bound: the Spark analog of the reference's
    * per-topic in-flight caps (consumer/legacy-consumer.ts:175-181).
    * `OneByOne` → 1 message per micro-batch (strict serialization);
    * `Topic` → sum of per-topic caps, with unlimited topics clamped to
    * `UnlimitedShareFactor × maxMessagesPerTopic`. The global bound is
    * approximate by nature — Kafka admission can't be split per topic
    * within one query; use [[perTopicPlans]] when exact per-topic caps
    * matter. */
  def maxOffsets(config: EngineConfig, router: RouteRegistry): Long =
    config.strategy match {
      case Strategy.OneByOne => 1L
      case Strategy.Topic =>
        val unlimitedShare = UnlimitedShareFactor * config.maxMessagesPerTopic
        router.topics.map { t =>
          config.perTopicCaps.getOrElse(t, Some(config.maxMessagesPerTopic))
            .map(_.toLong).getOrElse(unlimitedShare)
        }.sum
    }

  /** Exact per-topic admission: one streaming query per topic, each with
    * its own `maxOffsetsPerTrigger` (None = no bound). This is the faithful
    * translation of the reference's independent per-topic queues — at the
    * cost of one consumer group/query per topic. */
  def perTopicPlans(config: EngineConfig, router: RouteRegistry): Map[String, Option[Long]] =
    router.topics.map { t =>
      t -> (config.strategy match {
        case Strategy.OneByOne => Some(1L)
        case Strategy.Topic =>
          config.perTopicCaps.getOrElse(t, Some(config.maxMessagesPerTopic)).map(_.toLong)
      })
    }.toMap

  /** Batch Kafka sink with producer tuning passthrough (O18). */
  def sink(df: DataFrame, config: EngineConfig, host: String): Unit = {
    val w = df.write.format("kafka")
      .option("kafka.bootstrap.servers", host)
    config.compression.foreach(c => w.option("kafka.compression.type", c))
    if (config.idempotent) w.option("kafka.enable.idempotence", "true")
    w.save()
  }
}
